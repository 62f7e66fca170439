package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.Parity._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/interval operators Spark lacks as builtins, composed from
  * scalable primitives (SURVEY.md §2).
  */
object Temporal {

  /** AS-OF JOIN: for every error event, the most recent purchase by
    * the same user at-or-before it. Implemented as union + running
    * last_value over one shuffle (the scalable as-of shape — no range
    * join, no per-row probe). The oracle uses DuckDB's NATIVE ASOF
    * JOIN, making it an independent formulation of the semantics. */
  val qAsofJoin: GraftQuery = GraftQuery.sql(
    "q_asof_join",
    """SELECT e.event_id AS error_id, e.user_id,
      |       p.event_id AS matched_purchase_id
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id AND e.ts >= p.ts
      |ORDER BY error_id""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val tagged = ev.filter(col("event_type").isin("error", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("event_type") === "purchase").as("is_p"))
    // running latest purchase id per user; purchases sort before an
    // error at the same ts (ties impossible at ns precision anyway)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_p").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("matched_purchase_id",
        last(when(col("is_p"), col("event_id")), ignoreNulls = true).over(w))
      .filter(!col("is_p"))
      .select(col("event_id").as("error_id"), col("user_id"),
        col("matched_purchase_id"))
      .orderBy(col("error_id"))
  }

  /** RANGE JOIN: events against value bands. A naive inequality join
    * is a broadcast-nested-loop at scale; deriving the band key on
    * the probe side turns it into an equi-join (the pattern for any
    * fixed-width banding; variable-width bands get an exploded
    * band-index interval table, same shape). */
  val qRangeJoin: GraftQuery = GraftQuery.sql(
    "q_range_join",
    s"""WITH bands AS (SELECT DISTINCT CAST(FLOOR(value / 100) AS BIGINT) AS band_id,
       |  FLOOR(value / 100) * 100 AS band_lo, FLOOR(value / 100) * 100 + 100 AS band_hi
       |  FROM events)
       |SELECT b.band_lo, b.band_hi, COUNT(*) AS n_events, ${sumMSql("value")} AS total
       |FROM events e JOIN bands b ON CAST(FLOOR(e.value / 100) AS BIGINT) = b.band_id
       |GROUP BY b.band_lo, b.band_hi ORDER BY band_lo""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val bands = ev.select(floor(col("value") / 100).cast("long").as("band_id"))
      .distinct()
      .select(col("band_id"),
        (col("band_id") * 100).cast("double").as("band_lo"),
        (col("band_id") * 100 + 100).cast("double").as("band_hi"))
    ev.withColumn("probe_band", floor(col("value") / 100).cast("long"))
      .join(broadcast(bands), col("probe_band") === col("band_id"))
      .groupBy(col("band_lo"), col("band_hi"))
      .agg(count(lit(1)).as("n_events"), sumM(col("value")).as("total"))
      .orderBy(col("band_lo"))
  }

  def all: Seq[GraftQuery] = Seq(qAsofJoin, qRangeJoin)
}
