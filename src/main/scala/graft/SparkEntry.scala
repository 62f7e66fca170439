package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Queries are registered by the operator modules; this object only
  * assembles the registry.
  */
object SparkEntry {
  /** All registered queries, in SURVEY.md §2 order. */
  def registry: Seq[GraftQuery] =
    operators.Lake.all ++ operators.Namespace.all ++
      operators.Durability.all ++
      operators.Relational.all ++ operators.RelationalExt.all ++
      operators.RelationalMore.all ++ operators.RelationalTpch.all ++
      operators.Warehouse.all ++
      operators.StreamJoins.all ++ operators.Temporal.all ++
      operators.TextAnalysis.all ++ operators.Curation.all ++
      operators.Dedup.all ++
      operators.Similarity.all ++ operators.Multimodal.all ++
      operators.Streaming.all ++ operators.Layout.all ++
      operators.Analytics.all ++ operators.Insights.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
