package graft.api

import org.apache.spark.sql.SparkSession

/** SQL-only surface for the operator registry: temp views named
  * `graft_<operator>` over each registry entry's result, plus the base
  * tables under their bare names — a JDBC / spark-sql client gets the
  * same surface the Scala API exposes, without writing a line of
  * Scala (the lake-side analogue of the reference's protocol being
  * reachable from every client, protocol/ClientProtocol.java:1).
  *
  * {{{
  *   GraftViews.register(spark, sfDir, names = Seq("lake_health", "q_funnel"))
  *   spark.sql("SELECT * FROM graft_lake_health")
  * }}}
  *
  * Views are lazy plans: each SELECT re-runs the operator, including
  * any layout provisioning its body performs — amortized by the same
  * metadata staleness gates as the Scala path. Registering a view
  * does run the operator's plan-construction side effects (scratch
  * layout writes for the lake ops), which is why registration takes
  * an explicit name list rather than defaulting to the full registry.
  */
object GraftViews {

  /** Register the base tables as temp views under their bare names. */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    graft.Tables.names.foreach {
      case "events" => graft.Tables.events(spark, sfDir).createOrReplaceTempView("events")
      case t => graft.Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** Register `graft_<name>` views for the given registry operators
    * (plus the base tables). Unknown names fail fast. */
  def register(spark: SparkSession, sfDir: String, names: Seq[String]): Unit = {
    registerTables(spark, sfDir)
    val reg = graft.SparkEntry.queries
    names.foreach { n =>
      val fn = reg.getOrElse(n,
        throw new IllegalArgumentException(
          s"no such operator: $n (see SURVEY.md section 2)"))
      fn(spark, sfDir).createOrReplaceTempView(s"graft_$n")
    }
  }
}
