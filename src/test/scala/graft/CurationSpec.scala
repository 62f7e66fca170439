package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** BPE application + mixture materialization (SURVEY §2 t_bpe_encode,
  * t_dataset_mix): the oracle gate checks cross-engine parity; these
  * pin the mechanisms — boundary-exact merge semantics on hand-built
  * cases, and conservation laws on the materialized mixture.
  */
class CurationSpec extends SparkSpec {

  private def encodeOne(text: String): String = {
    import spark.implicits._
    Curation.bpeEncode(Seq(text).toDF("text"), "text")
      .select(col("bpe")).collect()(0).getString(0)
  }

  test("bpe encode: rank order, consecutive pairs, and boundary exactness on hand-built cases") {
    // 't h'→'th' then 'th e'→'the': later merges consume earlier output
    assert(encodeOne("ther") == "/|the|r")
    // consecutive equal pairs both merge (leftmost non-overlap is safe
    // because a pattern consumes only its OWN markers)
    assert(encodeOne("erer") == "/|er|er")
    // a merge never crosses a word boundary ('/' intervenes): 't h' in
    // "...t h..." split across words stays unmerged
    assert(encodeOne("cat hat") == "/|c|at/|h|at")
    // 'e r' must not fire inside a previously-merged 'er' token, and
    // 'r e' must not bridge 'er'+'e' ('|r|e' needs a marker before r)
    assert(encodeOne("ere") == "/|er|e")
  }

  test("bpe encode conservation: payload chars survive, tokens bounded by chars") {
    val enc = Curation.bpeEncode(Tables.documents(spark, sfDir), "text")
      .select(col("text"), col("n_tokens"), col("n_chars")).collect()
    enc.foreach { r =>
      val payload = r.getString(0).replace(" ", "").length.toLong
      assert(r.getLong(2) == payload, "n_chars must equal the space-free payload")
      assert(r.getLong(1) <= payload && r.getLong(1) > 0)
    }
    // merges actually fired somewhere: strictly fewer tokens than chars overall
    assert(enc.map(_.getLong(1)).sum < enc.map(_.getLong(2)).sum)
  }

  test("dataset mix: materialized copies are exact, distinct, and share sums to ~1000pm") {
    val docs = Tables.documents(spark, sfDir)
    val mixed = Curation.datasetMix(docs,
      expr("cast(substring(source, 4) as int) % 4 + 1"))
    // every (doc, copy) is distinct and copy < epochs
    assert(mixed.filter(col("copy") >= col("epochs") || col("copy") < 0).count() == 0)
    assert(mixed.select(col("doc_id"), col("copy")).distinct().count() == mixed.count())
    // per-source blow-up is exactly epochs × docs
    val perSrc = mixed.groupBy(col("source"), col("epochs"))
      .agg(count(lit(1)).as("n")).collect()
    val base = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSrc.foreach { r =>
      assert(r.getLong(2) == base(r.getString(0)) * r.getLong(1))
    }
    // audit shares: integer floors sum into (1000 - nsrc, 1000]
    val shares = Curation.tDatasetMix.fn(spark, sfDir)
      .select(col("share_pm")).collect().map(_.getLong(0))
    assert(shares.sum <= 1000 && shares.sum > 1000 - shares.length)
  }
}
