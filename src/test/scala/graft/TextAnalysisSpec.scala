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

  test("c4 filter accounting: kept + any-rule-fired covers every doc") {
    val rows = TextAnalysis.tC4Filter.fn(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      val (docs, kept) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(kept <= docs)
      // kept can't exceed docs minus the strictest single rule's hits
      val worst = Seq("n_too_short", "n_bad_wordlen", "n_dup_word")
        .map(r.getAs[Long]).max
      assert(kept <= docs - worst, s"kept $kept docs $docs worst $worst")
    }
    assert(rows.map(_.getAs[Long]("n_too_short")).sum > 0,
      "word-count floor should fire on this corpus")
    assert(rows.map(_.getAs[Long]("n_kept")).sum > 0, "gate rejected everything")
  }

  test("stratified sample matches a direct LCG recount and the target rates") {
    val rows = TextAnalysis.tStratifiedSample.fn(spark, sfDir).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
      .view.mapValues(rs => (rs.map(_.getAs[Long]("n_docs")).sum,
        rs.map(_.getAs[Long]("n_kept")).sum)).toMap
    // direct recount of one stratum family with the same coin
    val en = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en" &&
        ((col("doc_id") % 1000) * 245L + 345L) % 1000 < 200)
      .count()
    assert(byLang("en")._2 == en, s"en recount $en != ${byLang("en")._2}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("realized_pm") <= 1000L)
    }
    // mixture direction: the down-weighted language keeps a smaller
    // fraction than the heavily-kept ones (wide margin: 200 vs 800)
    val keepFrac = (l: String) => byLang(l)._2.toDouble / byLang(l)._1
    assert(keepFrac("en") < keepFrac("de") && keepFrac("en") < keepFrac("fr"))
  }

  test("sequence packing: conservation, span consistency, contiguity per shard") {
    import TextAnalysis.{PackShards, SeqBudget}
    val rows = TextAnalysis.tSeqPack.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, off) = (r.getAs[Long]("n_tok"), r.getAs[Long]("seq_offset"))
      val (sf, sl) = (r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last"))
      assert(off >= 0 && off < SeqBudget, s"offset $off outside [0,$SeqBudget)")
      // the doc's token span determines exactly which sequences it touches
      assert(sl == sf + (off + tok - 1) / SeqBudget,
        s"span mismatch: first=$sf last=$sl off=$off tok=$tok")
      assert(r.getAs[Long]("shard") == r.getAs[Long]("doc_id") % PackShards)
    }
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val total = rs.map(_.getAs[Long]("n_tok")).sum
      // conservation: the shard's token stream ends exactly where the
      // last doc's slice says it does — no token lost or duplicated
      val last = rs.maxBy(r => (r.getAs[Long]("seq_first"), r.getAs[Long]("seq_offset")))
      assert(last.getAs[Long]("seq_first") * SeqBudget + last.getAs[Long]("seq_offset") +
        last.getAs[Long]("n_tok") == total, s"shard $shard stream length mismatch")
      assert(rs.map(_.getAs[Long]("seq_last")).max == (total - 1) / SeqBudget)
      // contiguity: consecutive docs in doc_id order abut exactly —
      // next doc starts one token after the previous doc ends
      val ordered = rs.sortBy(_.getAs[Long]("doc_id"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val endA = a.getAs[Long]("seq_first") * SeqBudget +
            a.getAs[Long]("seq_offset") + a.getAs[Long]("n_tok")
          val startB = b.getAs[Long]("seq_first") * SeqBudget + b.getAs[Long]("seq_offset")
          assert(startB == endA, s"gap in shard $shard between docs")
        case _ =>
      }
      // every sequence except the shard's last is exactly full by
      // construction (concat-and-slice leaves no internal padding):
      // implied by contiguity + conservation above
    }
  }

  test("bpe pairs: top merge weight matches an independent corpus-level count") {
    val rows = TextAnalysis.tBpePairs.fn(spark, sfDir).collect()
    assert(rows.length == 20)
    val weights = rows.map(_.getAs[Long]("weight"))
    assert(weights.sameElements(weights.sorted.reverse), "not weight-descending")
    // recompute the winning pair's weight straight off the corpus
    // token stream (no vocab intermediate): occurrences of the pair
    // at any position in any token of length >= 2
    val top = rows.head
    val pair = top.getAs[String]("pair")
    val direct = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(explode(sequence(lit(1), length(col("tok")) - 1, lit(1))).as("i"), col("tok"))
      .filter(expr("substring(tok, i, 2)") === pair)
      .count()
    assert(top.getAs[Long]("weight") == direct,
      s"vocab-weighted count ${top.getAs[Long]("weight")} != corpus count $direct")
  }

  test("shuffle shard is a permutation: read order total, shards contiguous") {
    val rows = TextAnalysis.tShuffleShard.fn(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.length == total, "every doc must appear exactly once")
    // read_ord = (pos-1)*S + shard is injective iff (shard, pos) is
    assert(rows.map(_.getAs[Long]("read_ord")).distinct.length == rows.length)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val ps = rs.map(_.getAs[Long]("pos")).sorted
      assert(ps.head == 1L && ps.last == ps.length.toLong,
        s"shard $shard positions not contiguous 1..${ps.length}")
    }
    // deterministic: a second run yields the identical manifest
    val again = TextAnalysis.tShuffleShard.fn(spark, sfDir).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("dataset card: totals reconcile with the corpus and per-op ground truths") {
    val rows = TextAnalysis.tDatasetCard.fn(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // token mass matches the t_token_count per-lang view, re-summed
    val wsTotal = TextAnalysis.tTokenCount.fn(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("ws_tokens")).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("ws_tokens")).sum == wsTotal)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_chars") <= r.getAs[Long]("max_chars"))
      assert(r.getAs[Long]("dup_rows") >= 0L &&
        r.getAs[Long]("dup_rows") < r.getAs[Long]("n_docs"))
      val q = r.getAs[Long]("quality_pm_avg")
      assert(q >= 0L && q <= 1000L, s"quality per-mille out of range: $q")
      assert(r.getAs[Long]("n_langs") >= 1L)
    }
    // dominant language agrees with a direct mode computation
    val direct = docs.groupBy("source", "lang").count()
      .collect().groupBy(_.getAs[String]("source"))
      .map { case (s0, rs) =>
        s0 -> rs.maxBy(r => (r.getAs[Long]("count"), r.getAs[String]("lang")))(
          Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
          .getAs[String]("lang")
      }
    rows.foreach(r => assert(r.getAs[String]("top_lang") ==
      direct(r.getAs[String]("source"))))
  }

  test("gopher filter: totals conserve and two rules recount for one source") {
    val rows = TextAnalysis.tGopherFilter.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val viol = r.getAs[Long]("n_bad_wordcount") + r.getAs[Long]("n_bad_symbol") +
        r.getAs[Long]("n_bad_alpha") + r.getAs[Long]("n_bad_stopword")
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      // inclusion-exclusion lower bound: kept >= docs - sum of violations
      assert(r.getAs[Long]("n_kept") >= r.getAs[Long]("n_docs") - viol)
    }
    // driver recount of the word-count and stop-word rules on one source
    val src = rows.head.getAs[String]("source")
    val texts = Tables.documents(spark, sfDir).filter(col("source") === src)
      .select("text").collect().map(_.getString(0))
    val wc = texts.count { t =>
      val n = t.split(" ", -1).length; n < 50 || n > 100000
    }
    assert(rows.head.getAs[Long]("n_bad_wordcount") == wc.toLong)
    val stops = TextAnalysis.StopWords.toSet
    val sw = texts.count(t => t.split(" ", -1).iterator.filter(stops).toSet.size < 2)
    assert(rows.head.getAs[Long]("n_bad_stopword") == sw.toLong)
  }

  test("zipf report: ranks contiguous, counts non-increasing, head word recounts") {
    val rows = TextAnalysis.tZipfReport.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length.toLong))
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sliding(2).forall { case Array(x, y) => x >= y; case _ => true })
    // rank 1 is the Zipf anchor: ratio exactly 1000 per-mille
    assert(rows.head.getAs[Long]("zipf_pm") == 1000L)
    rows.foreach { r =>
      val want = 1000L * r.getAs[Long]("n") * r.getAs[Long]("rank") / ns.head
      assert(r.getAs[Long]("zipf_pm") == want)
    }
    // driver recount of the most frequent word
    val freq = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (topWord, topN) = freq.toSeq.minBy { case (w, n) => (-n, w) }
    assert(rows.head.getAs[String]("word") == topWord)
    assert(rows.head.getAs[Long]("n") == topN)
  }

  test("keyword lift: every board row's lift recomputes from raw token counts") {
    val rows = TextAnalysis.tKeywordLift.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver recount of the full (source, word) census
    val toks = Tables.documents(spark, sfDir).select("source", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split("[^a-z]+")
        .filter(_.nonEmpty).map(w => (r.getString(0), w)))
    val c = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ts = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nw = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = toks.length.toLong
    rows.foreach { r =>
      val (src, w) = (r.getAs[String]("source"), r.getAs[String]("word"))
      val n = c((src, w))
      assert(n >= 5L && r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("lift_pm") == 1000L * n * nn / (ts(src) * nw(w)),
        s"lift for ($src,$w)")
    }
    // per source: ranks contiguous from 1, lift non-increasing
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length.toLong))
      val ls = sorted.map(_.getAs[Long]("lift_pm"))
      assert(ls.sliding(2).forall { case Array(x, y) => x >= y; case _ => true })
    }
  }

  test("lexical diversity: per-doc Gini recomputes from raw tokens") {
    val rows = TextAnalysis.tLexicalDiversity.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getString(1)).toMap
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).toLowerCase
        .split("[^a-z]+").filter(_.nonEmpty)
      val l = toks.length.toLong
      val sq = toks.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
      assert(r.getAs[Long]("n_tokens") == l)
      assert(r.getAs[Long]("n_distinct") == toks.distinct.length.toLong)
      val want = if (l > 0) 1000L * (l * l - sq) / (l * l) else 0L
      assert(r.getAs[Long]("diversity_pm") == want)
      assert(r.getAs[Long]("diversity_pm") >= 0L && r.getAs[Long]("diversity_pm") < 1000L)
    }
    // natural prose vs templated text must actually separate scores
    val ds = rows.map(_.getAs[Long]("diversity_pm"))
    assert(ds.max > ds.min)
  }

  test("boilerplate ngrams: occurrence and doc-spread counts recount from raw windows") {
    val rows = TextAnalysis.tBoilerplateNgrams.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val wins = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .flatMap { r =>
        val t = r.getString(1).split(" ", -1)
        if (t.length < 8) Seq.empty
        else t.sliding(8).map(w => r.getAs[Long]("doc_id") -> w.mkString(" ")).toSeq
      }
    val occ = wins.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val docs = wins.groupBy(_._2).view.mapValues(_.map(_._1).distinct.length.toLong).toMap
    rows.foreach { r =>
      val g = r.getAs[String]("ngram")
      assert(r.getAs[Long]("n_occurrences") == occ(g) && occ(g) >= 2)
      assert(r.getAs[Long]("n_docs") == docs(g))
      assert(g.split(" ", -1).length == 8)
    }
    // top-30 really is the top of the full repeated-window distribution
    val cut = rows.map(_.getAs[Long]("n_occurrences")).min
    assert(occ.values.count(_ > cut) <= rows.length)
  }

  test("bigram novelty: per-doc unique-share recomputes from raw bigram sets") {
    val rows = TextAnalysis.tBigramNovelty.fn(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> {
        val t = r.getString(1).split(" ", -1)
        t.indices.dropRight(1).map(i => t(i) + " " + t(i + 1)).toSet
      }).toMap
    assert(rows.length == docs.size, "one row per document")
    val df = docs.values.toSeq.flatMap(_.toSeq)
      .groupBy(identity).map { case (k, vs) => k -> vs.size }
    var anyUnique = false
    rows.foreach { r =>
      val bgs = docs(r.getAs[Long]("doc_id"))
      val uniq = bgs.count(df(_) == 1).toLong
      assert(r.getAs[Long]("n_bigrams") == bgs.size.toLong)
      assert(r.getAs[Long]("n_unique") == uniq)
      val pm = if (bgs.isEmpty) 0L else 1000L * uniq / bgs.size
      assert(r.getAs[Long]("novelty_pm") == pm)
      anyUnique ||= uniq > 0
    }
    assert(anyUnique, "corpus should contain some doc-unique bigrams")
  }

  test("length outlier: per-slice argmax and sigma flags recompute from n_chars") {
    val rows = TextAnalysis.tLengthOutlier.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "lang", "n_chars").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("lang"), r.getAs[Long]("n_chars")))
    val groups = docs.groupBy(d => (d._2, d._3))
    assert(rows.length == groups.size, "one row per (source, lang) slice")
    rows.foreach { r =>
      val g = groups((r.getAs[String]("source"), r.getAs[String]("lang")))
      val n = BigInt(g.length)
      val s = g.map(d => BigInt(d._4)).sum
      val q = g.map(d => BigInt(d._4) * d._4).sum
      // deterministic argmax: max |n*len - S|, tiebreak doc_id
      val top = g.minBy(d => (-(n * d._4 - s).abs, d._1))
      val dev = n * top._4 - s
      assert(r.getAs[Long]("doc_id") == top._1)
      assert(r.getAs[Long]("n_docs") == g.length.toLong)
      assert(r.getAs[Long]("mean_chars") == (s / n).toLong)
      assert(r.getAs[Long]("n_chars") == top._4)
      assert(r.getAs[String]("dev_side") == (if (dev >= 0) "long" else "short"))
      val spread = n * q - s * s
      assert(r.getAs[Long]("over_2s") == (if (dev * dev > 4 * spread) 1L else 0L))
      assert(r.getAs[Long]("over_3s") == (if (dev * dev > 9 * spread) 1L else 0L))
      // the 3-sigma flag implies the 2-sigma flag
      assert(r.getAs[Long]("over_3s") <= r.getAs[Long]("over_2s"))
    }
  }

  test("reservoir sample: exactly k per stratum, deterministic, equals the hash-permutation model") {
    val ta = graft.operators.TextAnalysis
    val rows = ta.tReservoirSample.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("rn"), r.getAs[Long]("doc_id")))
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "doc_id").collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("doc_id"))
    val byLang = docs.groupBy(_._1)
    // per stratum: exactly min(k, |stratum|) rows, ranks contiguous from 1
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val expectN = math.min(ta.ReservoirK, byLang(lang).size)
      assert(rs.length == expectN, s"$lang: ${rs.length} rows, want $expectN")
      assert(rs.map(_._2).sorted.toSeq == (1L to expectN.toLong))
    }
    // the sample IS the k lowest under the keyed permutation (driver model)
    def hk(id: Long) = ((id % ta.ResP) * ta.ResA + ta.ResB) % ta.ResP
    byLang.foreach { case (lang, ds) =>
      val model = ds.map(_._2).sortBy(id => (hk(id), id)).take(ta.ReservoirK)
      val got = rows.filter(_._1 == lang).sortBy(_._2).map(_._3).toSeq
      assert(got == model.toSeq, s"$lang: sample disagrees with the model")
    }
    // deterministic across reruns
    val again = ta.tReservoirSample.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("rn"), r.getAs[Long]("doc_id")))
    assert(again.toSeq == rows.toSeq)
  }
}
