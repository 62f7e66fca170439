package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One entry in the engine's public query surface (SURVEY.md §2).
  *
  * @param name   stable key, matches SURVEY.md §2 line
  * @param fn     (session, scale-factor dir) => result
  * @param oracle equivalent DuckDB ANSI SQL over the same parquet
  *               tables, or None when not SQL-expressible (driver then
  *               records a rows-only check)
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, None)
}
