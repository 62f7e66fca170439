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

  test("doc chunk: windows cover every token, overlap by W-S, and fps match a local rechunk") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val manifest = Curation.tDocChunk.fn(spark, sfDir).collect()
    val byDoc = manifest.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet, "every doc must produce chunks")
    val (w, s) = (Curation.ChunkW, Curation.ChunkS)
    byDoc.foreach { case (id, rows) =>
      val n = docs(id).split(" ", -1).length
      val expect = if (n <= w) 1 else (n - w + s - 1) / s + 1
      assert(rows.length == expect, s"doc $id: ${rows.length} chunks, expected $expect")
      // chunk indices are 0..expect-1; all but possibly the last are full
      val idx = rows.map(_.getLong(1)).sorted
      assert(idx.sameElements(0L until expect.toLong))
      rows.foreach { r =>
        val tok = r.getLong(2)
        if (r.getLong(1) < expect - 1) assert(tok == w) else assert(tok > 0 && tok <= w)
      }
      // coverage: last chunk reaches the final token
      assert(idx.last * s + rows.maxBy(_.getLong(1)).getLong(2) == n)
    }
    // content gate sanity: a local rechunk reproduces a sample of fps
    import graft.functions.GraftHash.{P, Seed}
    def charHash(t: String): Long =
      t.codePoints().toArray.foldLeft(Seed)((h, c) => (h * 31 + c) % P)
    manifest.take(50).foreach { r =>
      val toks = docs(r.getLong(0)).split(" ", -1)
      val start = (r.getLong(1) * s).toInt
      val chunk = toks.slice(start, start + w).mkString(" ")
      assert(charHash(chunk) == r.getLong(3), s"fp mismatch doc ${r.getLong(0)} chunk ${r.getLong(1)}")
    }
  }

  test("train split: partition is total, leak-free train, and leaks are exactly cross-split dup fps") {
    val out = Curation.tTrainSplit.fn(spark, sfDir).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, sfDir).count())
    // train rows never count leaks (leakage is an eval-side concept)
    out.filter(_.getString(0) == "train").foreach(r => assert(r.getLong(3) == 0L))
    // recount leaks locally from fingerprints
    import graft.functions.GraftHash.{P, Seed}
    def charHash(t: String): Long =
      t.codePoints().toArray.foldLeft(Seed)((h, c) => (h * 31 + c) % P)
    val rows = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        charHash(r.getString(1).split(" ", -1).take(Curation.PfxTok).mkString(" "))))
    def splitOf(id: Long): String = {
      val pm = (id * 1103515245L + 12345L) % 1000
      if (pm < 900) "train" else if (pm < 950) "val" else "test"
    }
    val trainFps = rows.collect { case (id, fp) if splitOf(id) == "train" => fp }.toSet
    val leaks = rows.count { case (id, fp) => splitOf(id) != "train" && trainFps(fp) }
    assert(out.map(_.getLong(3)).sum == leaks)
    assert(leaks > 0, "synthetic corpus has exact dups — the audit must see some")
  }

  test("tokenizer fertility: word and token masses recount per language") {
    val rows = Curation.tTokenizerFertility.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val ts = docs.filter(_._1 == lang).map(_._2)
      val words = ts.map(_.split(" ", -1).count(_.nonEmpty).toLong).sum
      assert(r.getAs[Long]("n_docs") == ts.length.toLong)
      assert(r.getAs[Long]("n_words") == words)
      // BPE tokens >= merged floor: at least one token per word piece,
      // and the per-mille identity must hold exactly
      assert(r.getAs[Long]("fertility_pm") ==
        r.getAs[Long]("n_tokens") * 1000 / words)
      assert(r.getAs[Long]("n_tokens") >= words,
        "each word yields at least one BPE token")
    }
  }

  test("effective mix: arithmetic reconciles with the dedup impact report") {
    val rows = Curation.tEffectiveMix.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val impact = graft.operators.Dedup.dDedupImpact.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("kept_chars"), r.getAs[Long]("total_chars"))).toMap
    val totalEff = rows.map(_.getAs[Long]("effective_chars")).sum
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val (kc, tc) = impact(src)
      val ep = src.drop(3).toInt % 4 + 1
      assert(r.getAs[Long]("epochs") == ep.toLong)
      assert(r.getAs[Long]("kept_chars") == kc)
      assert(r.getAs[Long]("effective_chars") == ep * kc)
      assert(r.getAs[Long]("waste_pm") == 1000L * ep * (tc - kc) / (ep * tc))
      assert(r.getAs[Long]("share_pm") == 1000L * ep * kc / totalEff)
    }
    // shares form a (floor-divided) distribution
    val shares = rows.map(_.getAs[Long]("share_pm")).sum
    assert(shares > 900L && shares <= 1000L)
  }
}
