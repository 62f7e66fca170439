package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.Parity._
import org.apache.spark.sql.functions._

/** Stream-join batch truths (SURVEY.md §2) — the streaming graphs in
  * streaming.StreamingOps.{enrichEvents, intervalJoin} must converge
  * to these.
  */
object StreamJoins {

  /** Stream-static enrichment: events joined to the customer dim
    * (broadcast at scale), aggregated per segment x type. */
  val stEnrichJoin: GraftQuery = GraftQuery.sql(
    "st_enrich_join",
    s"""SELECT c_mktsegment, event_type, COUNT(*) AS n, ${sumMSql("value")} AS total
       |FROM events JOIN customer ON user_id = c_custkey
       |GROUP BY c_mktsegment, event_type ORDER BY c_mktsegment, event_type""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .join(broadcast(Tables.customer(s, d)), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumM(col("value")).as("total"))
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** Interval join: purchases within 24h after a signup by the same
    * user (equi-key + time-range — the stream-stream join shape). */
  val stIntervalJoin: GraftQuery = GraftQuery.sql(
    "st_interval_join",
    """SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id
      |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup') s
      |JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
      |  ON s.user_id = p.user_id
      | AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 24 HOUR
      |ORDER BY s.user_id, signup_id, purchase_id""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    signups.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") > col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 24 HOUR"))
      .select(col("user_id"), col("signup_id"), col("purchase_id"))
      .orderBy(col("user_id"), col("signup_id"), col("purchase_id"))
  }

  /** LEFT OUTER form of the interval join: signups with no purchase
    * inside the 24h window surface with a NULL purchase_id. In the
    * streaming form the null row can only be emitted once the
    * watermark proves no match can still arrive — the semantics
    * Structured Streaming's outer interval join exists for. */
  val stIntervalJoinOuter: GraftQuery = GraftQuery.sql(
    "st_interval_join_outer",
    """SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id
      |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup') s
      |LEFT JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
      |  ON s.user_id = p.user_id
      | AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 24 HOUR
      |ORDER BY s.user_id, signup_id, purchase_id""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    signups.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") > col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 24 HOUR"), "left_outer")
      .select(col("user_id"), col("signup_id"), col("purchase_id"))
      .orderBy(col("user_id"), col("signup_id"), col("purchase_id"))
  }

  def all: Seq[GraftQuery] = Seq(stEnrichJoin, stIntervalJoin, stIntervalJoinOuter)
}
