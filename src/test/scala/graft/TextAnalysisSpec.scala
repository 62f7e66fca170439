package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Text-analysis family invariants beyond the DuckDB oracle gate
  * (which pins exact values at sf0.01). */
class TextAnalysisSpec extends SparkSpec {

  test("every TextAnalysis query runs and returns rows at sf0.001") {
    TextAnalysis.all.foreach { q =>
      val rows = q.fn(spark, sfDir).count()
      assert(rows > 0, s"${q.name} returned 0 rows")
    }
  }

  test("repetition filter: exact accounting and an independent recomputation") {
    val rows = TextAnalysis.tRepetitionFilter.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nFlag) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_flagged"))
      val (dup, tot) = (r.getAs[Long]("dup_bigrams"), r.getAs[Long]("total_bigrams"))
      assert(nFlag <= nDocs && dup <= tot)
      assert(r.getAs[Double]("corpus_dup_frac") == dup.toDouble / tot,
        "corpus fraction must be the exact integer ratio")
    }
    // the synthetic corpus contains genuinely repetitive docs
    assert(rows.map(_.getAs[Long]("n_flagged")).sum > 0, "no repetitive docs flagged")
    // independent recomputation: explode-and-count per doc must give
    // the same corpus totals as the array-side size/array_distinct
    val viaExplode = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ", -1).as("t"))
      .select(col("doc_id"), posexplode(col("t")).as(Seq("p", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")).orderBy(col("p"))))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat(col("tok"), lit(" "), col("nxt")).as("bigram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nbg"), countDistinct(col("bigram")).as("ndist"))
      .agg(sum(col("nbg") - col("ndist")), sum(col("nbg")))
      .collect()(0)
    assert(rows.map(_.getAs[Long]("dup_bigrams")).sum == viaExplode.getLong(0))
    assert(rows.map(_.getAs[Long]("total_bigrams")).sum == viaExplode.getLong(1))
  }
}
