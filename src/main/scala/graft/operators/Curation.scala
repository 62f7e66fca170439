package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-curation tranche of the LLM-pipeline surface (SURVEY.md §2):
  * tokenizer APPLICATION (the encode half t_bpe_pairs trains for) and
  * mixture materialization (the epoch-weighted source recipe a
  * pretraining run consumes after curation).
  */
object Curation {

  /** Fixed BPE merge table, rank order (the contract: merges apply
    * greedily best-rank-first, later merges may consume earlier
    * merges' output — 'th'+'e' below only exists because 't'+'h' ran
    * first). Embedded identically in both engines. */
  val Merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "o" -> "n", "r" -> "e", "a" -> "t", "s" -> "t", "o" -> "r")

  /** Marker-string BPE encode of a text column: the doc becomes
    * `/|c|h|a|r|s` (every word opens with `/`, every symbol with `|`),
    * and each merge (a,b) is one whole-string literal replace of
    * `|a|b` with `|ab`, applied in rank order. The leading markers
    * make matching boundary-exact with NO shared characters between
    * adjacent matches (a pattern consumes its own markers only), so
    * leftmost non-overlapping replace — the semantics of both
    * engines' `replace` — applies consecutive equal pairs correctly
    * and can never merge across a token or word boundary (a `|`/`/`
    * always intervenes). Returns `bpe` (encoded string), `n_tokens`
    * (symbols after merging = `|` count), `n_chars` (payload chars).
    *
    * Scale shape: pure per-row map work over one scan — no shuffle,
    * no UDF (codegen'd regexp/replace/length chain); the merge table
    * is a compile-time constant exactly as a production tokenizer
    * ships its vocabulary to every executor. */
  def bpeEncode(df: org.apache.spark.sql.DataFrame, textCol: String,
                merges: Seq[(String, String)] = Merges): org.apache.spark.sql.DataFrame = {
    val base: Column =
      concat(lit("/"), replace(
        regexp_replace(col(textCol), "(.)", "|$1"), lit("| "), lit("/")))
    val enc = merges.foldLeft(base) { case (e, (a, b)) =>
      replace(e, lit(s"|$a|$b"), lit(s"|$a$b"))
    }
    df.withColumn("bpe", enc)
      .withColumn("n_tokens",
        (length(col("bpe")) - length(replace(col("bpe"), lit("|"), lit("")))).cast("long"))
      .withColumn("n_chars",
        length(replace(replace(col("bpe"), lit("|"), lit("")), lit("/"), lit(""))).cast("long"))
  }

  /** DuckDB SQL computing exactly bpeEncode's `bpe` column. */
  def bpeEncodeSql(textExpr: String, merges: Seq[(String, String)] = Merges): String =
    merges.foldLeft(
      s"'/' || replace(regexp_replace($textExpr, '(.)', '|\\1', 'g'), '| ', '/')") {
      case (e, (a, b)) => s"replace($e, '|$a|$b', '|$a$b')"
    }

  /** BPE ENCODE — apply the learned merge ranks to the corpus (the
    * inference half of tokenizer training; t_bpe_pairs is the
    * training half): per language, docs, post-merge token count,
    * payload chars, and the realized compression as integer chars
    * per kilotoken. Integer-exact in both engines. */
  val tBpeEncode: GraftQuery = GraftQuery.sql(
    "t_bpe_encode", {
      val e = bpeEncodeSql("text")
      s"""WITH enc AS (SELECT lang, $e AS e FROM documents)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(length(e) - length(replace(e, '|', ''))) AS BIGINT) AS n_tokens,
         |  CAST(SUM(length(replace(replace(e, '|', ''), '/', ''))) AS BIGINT) AS n_chars,
         |  CAST(SUM(length(replace(replace(e, '|', ''), '/', ''))) * 1000
         |    // SUM(length(e) - length(replace(e, '|', ''))) AS BIGINT) AS chars_per_ktok
         |FROM enc GROUP BY lang ORDER BY lang""".stripMargin
    }
  ) { (s, d) =>
    bpeEncode(Tables.documents(s, d), "text")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .withColumn("chars_per_ktok", expr("n_chars * 1000 div n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("chars_per_ktok"))
      .orderBy(col("lang"))
  }

  /** Epoch-weighted mixture materialization: every doc of source k is
    * repeated `epochs(k)` times (a `copy` index distinguishes
    * repeats) — the upsampling recipe pretraining runs use to weight
    * high-quality sources by multiple epochs. The repeat factor here
    * is a deterministic per-source tier (1..4); a production caller
    * passes its own weights. Returns the materialized frame with the
    * `copy` column: downstream it composes with
    * Graft.text.shuffleShards on (doc_id·maxEpochs + copy) for the
    * interleaved read order.
    *
    * Scale shape: explode(sequence) is a narrow per-row generator —
    * output rows = Σ epochs(k)·|src_k| with NO shuffle or join; the
    * corpus is scanned once and the blow-up factor is the mixture's
    * own token multiplier, the minimum any materialized recipe pays. */
  def datasetMix(df: org.apache.spark.sql.DataFrame,
                 epochsCol: Column): org.apache.spark.sql.DataFrame =
    df.withColumn("epochs", epochsCol.cast("long"))
      .withColumn("copy", explode(expr("sequence(cast(0 as long), epochs - 1)")))

  /** DATASET MIX — materialize the epoch-weighted mixture and audit
    * it: per source, input docs, epoch factor, materialized samples,
    * realized corpus share (per-mille, integer-exact), and token
    * mass. The audit aggregates the MATERIALIZED frame, so a wrong
    * explode shows up as a count/share mismatch, not just a bad
    * formula. share_pm divides by the cross-source total via a
    * window over the post-aggregation frame — bounded by the source
    * count (20 rows), never corpus-sized. */
  val tDatasetMix: GraftQuery = GraftQuery.sql(
    "t_dataset_mix",
    """WITH m AS (SELECT source,
      |    CAST(substring(source, 4) AS INT) % 4 + 1 AS epochs,
      |    COUNT(*) AS n_docs, SUM(n_chars) AS toks
      |  FROM documents GROUP BY 1, 2)
      |SELECT source, CAST(epochs AS BIGINT) AS epochs, n_docs,
      |  CAST(n_docs * epochs AS BIGINT) AS n_samples,
      |  CAST(n_docs * epochs * 1000 // SUM(n_docs * epochs) OVER () AS BIGINT) AS share_pm,
      |  CAST(toks * epochs AS BIGINT) AS tok_samples
      |FROM m ORDER BY source""".stripMargin
  ) { (s, d) =>
    val mixed = datasetMix(Tables.documents(s, d),
      expr("cast(substring(source, 4) as int) % 4 + 1"))
    mixed.groupBy(col("source"), col("epochs"))
      .agg(count(when(col("copy") === 0L, 1)).as("n_docs"),
        count(lit(1)).as("n_samples"),
        sum(col("n_chars")).as("tok_samples"))
      // bounded global window: runs over the per-SOURCE aggregate
      // (20 rows at any corpus size), the adjudicated tiny class —
      // constant partition key declares it (no WindowExec warning)
      .withColumn("share_pm", expr(
        "n_samples * 1000 div sum(n_samples) over (partition by pmod(hash(source), 1))"))
      .select(col("source"), col("epochs"), col("n_docs"), col("n_samples"),
        col("share_pm"), col("tok_samples"))
      .orderBy(col("source"))
  }

  /** Chunk window (tokens) and stride; overlap = ChunkW - ChunkS.
    * Sized to the synthetic docs (~54 tokens avg); a production
    * caller uses its context budget (e.g. 512/384). The math is
    * size-independent. */
  val ChunkW = 32
  val ChunkS = 24

  /** TOKEN-WINDOW CHUNKING — split every document into fixed-size
    * overlapping token windows (the retrieval/embedding prep step:
    * each chunk becomes an embedding unit; the overlap keeps
    * boundary-spanning context retrievable). Complementary to
    * t_seq_pack: packing CONCATENATES docs into training sequences,
    * chunking SPLITS docs into indexable windows. Output is the full
    * chunk manifest — (doc, chunk index, chunk token count, parity
    * fingerprint of the chunk TEXT) — so the gate verifies chunk
    * content, not just counts: a one-token boundary slip changes
    * every fp.
    *
    * Scale shape: pure narrow per-row work — one scan, a sequence()
    * generator per doc (output rows = total chunks, the pipeline's
    * own fan-out), codegen'd slice/array_join/hash, NO shuffle or
    * join at any corpus size. */
  val tDocChunk: GraftQuery = GraftQuery.sql(
    "t_doc_chunk", {
      val fp = graft.functions.GraftHash.charHashSql(
        s"array_to_string(list_slice(t, chunk * $ChunkS + 1, chunk * $ChunkS + $ChunkW), ' ')")
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t,
         |    len(string_split(text, ' ')) AS n FROM documents),
         |ch AS (SELECT doc_id, t, n, unnest(range(CASE WHEN n <= $ChunkW THEN 1
         |    ELSE (n - $ChunkW + ${ChunkS - 1}) // $ChunkS + 1 END)) AS chunk FROM tk)
         |SELECT doc_id, CAST(chunk AS BIGINT) AS chunk,
         |  CAST(LEAST($ChunkW, n - chunk * $ChunkS) AS BIGINT) AS n_tok,
         |  $fp AS fp
         |FROM ch ORDER BY doc_id, chunk""".stripMargin
    }
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ", -1).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .withColumn("chunk", explode(expr(
        s"sequence(0L, CASE WHEN n <= $ChunkW THEN 0L ELSE (n - $ChunkW + ${ChunkS - 1}) div $ChunkS END)")))
      .select(col("doc_id"), col("chunk"),
        least(lit(ChunkW.toLong), col("n") - col("chunk") * ChunkS).as("n_tok"),
        graft.functions.GraftHash.charHash(
          array_join(slice(col("t"), (col("chunk") * ChunkS + 1).cast("int"),
            lit(ChunkW)), " ")).as("fp"))
      .orderBy(col("doc_id"), col("chunk"))
  }

  /** Leak-key prefix length (tokens): two docs sharing their first
    * PfxTok tokens share the leak fingerprint. */
  val PfxTok = 16

  /** TRAIN/VAL/TEST SPLIT with a shared-opening leakage audit — the
    * split-assignment step every training run pays, made reproducible
    * and audited: membership is the deterministic integer-LCG coin on
    * doc_id (the t_stratified_sample convention — no RNG state, stable
    * at any parallelism; 900/50/50 per-mille), and every non-train doc
    * whose OPENING fingerprint (parity hash of the first PfxTok
    * tokens — the cheap contamination proxy: contaminated evals
    * overwhelmingly share document openings with their training copy)
    * also appears in train is counted as leaked. The near-dup-aware
    * half is d_decontaminate (banded cross-set candidates); this is
    * the exact prefix gate that runs first.
    *
    * Scale shape: one scan computes (split, fp); the train fingerprint
    * set is a hash-distinct and the leak check a fp equi-join — both
    * shuffle on fp, both linear; no all-pairs anything. */
  val tTrainSplit: GraftQuery = GraftQuery.sql(
    "t_train_split", {
      val fp = graft.functions.GraftHash.charHashSql(
        s"array_to_string(list_slice(string_split(text, ' '), 1, $PfxTok), ' ')")
      s"""WITH f AS (SELECT lang, $fp AS fp,
         |    CASE WHEN ((doc_id % 1000) * 245 + 345) % 1000 < 900 THEN 'train'
         |         WHEN ((doc_id % 1000) * 245 + 345) % 1000 < 950 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |tr AS (SELECT DISTINCT fp FROM f WHERE split = 'train')
         |SELECT f.split, f.lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN f.split <> 'train' AND tr.fp IS NOT NULL
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
         |FROM f LEFT JOIN tr ON f.fp = tr.fp
         |GROUP BY f.split, f.lang ORDER BY f.split, f.lang""".stripMargin
    }
  ) { (s, d) =>
    val f = Tables.documents(s, d).select(col("lang"),
      graft.functions.GraftHash.charHash(
        array_join(slice(split(col("text"), " ", -1), 1, PfxTok), " ")).as("fp"),
      // ADVICE r8: the full-width LCG (doc_id * 1103515245 + 12345)
      // overflows Int64 for doc_id ≳ 8.4e9 — Spark wraps silently
      // negative (emptying val/test) while DuckDB raises. Reduce
      // doc_id mod 1000 FIRST: 1103515245 ≡ 245 and 12345 ≡ 345
      // (mod 1000), so this is the identical residue map for every
      // non-negative doc_id, with a max intermediate of 245 100.
      when(((col("doc_id") % 1000) * 245L + 345L) % 1000 < 900, "train")
        .when(((col("doc_id") % 1000) * 245L + 345L) % 1000 < 950, "val")
        .otherwise("test").as("split"))
    val tr = f.filter(col("split") === "train").select(col("fp").as("tfp")).distinct()
    f.join(tr, col("fp") === col("tfp"), "left")
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("split") =!= "train" && col("tfp").isNotNull, 1L)
          .otherwise(0L)).as("n_leaked"))
      .orderBy(col("split"), col("lang"))
  }

  /** TOKENIZER FERTILITY — BPE tokens per whitespace word, by
    * language (THE vocab-fairness number: a tokenizer with fertility
    * 1100‰ on English and 2800‰ on Chinese makes Chinese text ~2.5×
    * more expensive per word in context budget and compute — the
    * metric that decides vocab allocation before any multilingual
    * training run; t_bpe_encode's chars_per_ktok measures
    * compression, this measures per-WORD cost): per lang, word and
    * BPE-token mass with fertility per-mille ⌊1000·tokens/words⌋.
    *
    * One scan: the encode fold and the word count are both row-local
    * string expressions (codegen'd), then one map-side-combined lang
    * rollup — the corpus never shuffles, only per-lang partials. */
  val tTokenizerFertility: GraftQuery = GraftQuery.sql(
    "t_tokenizer_fertility", {
      val e = bpeEncodeSql("text")
      s"""WITH enc AS (SELECT lang, $e AS e,
         |    len(list_filter(string_split(text, ' '), w -> w <> '')) AS nw
         |  FROM documents)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(nw) AS BIGINT) AS n_words,
         |  CAST(SUM(length(e) - length(replace(e, '|', ''))) AS BIGINT) AS n_tokens,
         |  CAST(SUM(length(e) - length(replace(e, '|', ''))) * 1000
         |    // SUM(nw) AS BIGINT) AS fertility_pm
         |FROM enc GROUP BY lang ORDER BY lang""".stripMargin
    }
  ) { (s, d) =>
    bpeEncode(Tables.documents(s, d), "text")
      .withColumn("nw",
        expr("cast(size(filter(split(text, ' ', -1), w -> w != '')) as bigint)"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"))
      .withColumn("fertility_pm", expr("n_tokens * 1000 div n_words"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        col("fertility_pm"))
      .orderBy(col("lang"))
  }

  /** EFFECTIVE MIXTURE after dedup — the correction d_dedup_impact's
    * report exists to feed (a mixture recipe weighted on RAW source
    * mass over-trains on duplicate-heavy sources: the epochs multiply
    * content that dedup will remove, so the REALIZED mixture differs
    * from the designed one; every production recipe recomputes its
    * weights from kept mass): per source, the t_dataset_mix epoch
    * factor applied to the dedup-KEPT character mass — effective
    * chars, the waste the raw-mass plan would have paid (per-mille),
    * and each source's realized share of the post-dedup mixture.
    *
    * The kept set is the same memoized minhash-cluster dedup the
    * d_* family shares (free when warm); the mixture arithmetic runs
    * on the source-bounded rollup, with the share denominator a
    * whole-frame window over that ~20-row frame (bounded class). */
  val tEffectiveMix: GraftQuery = GraftQuery.sql(
    "t_effective_mix",
    s"""WITH RECURSIVE ${graft.operators.Dedup.minhashPairsCtes()},
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL
       |          SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach AS (SELECT src AS node, src AS lbl FROM edges
       |          UNION
       |          SELECT e.dst AS node, r.lbl AS lbl
       |          FROM reach r JOIN edges e ON r.node = e.src),
       |comp AS (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node),
       |dropped AS (SELECT node FROM comp WHERE node <> cluster),
       |sm AS (SELECT d.source,
       |    CAST(substring(d.source, 4) AS INT) % 4 + 1 AS epochs,
       |    SUM(d.n_chars) AS total_chars,
       |    SUM(CASE WHEN dr.node IS NULL THEN d.n_chars ELSE 0 END) AS kept_chars
       |  FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.node
       |  GROUP BY d.source),
       |ef AS (SELECT source, CAST(epochs AS BIGINT) AS epochs,
       |    CAST(kept_chars AS BIGINT) AS kept_chars,
       |    CAST(epochs * kept_chars AS BIGINT) AS effective_chars,
       |    CAST((1000 * epochs * (total_chars - kept_chars))
       |      // (epochs * total_chars) AS BIGINT) AS waste_pm
       |  FROM sm)
       |SELECT source, epochs, kept_chars, effective_chars, waste_pm,
       |  CAST((1000 * effective_chars) // SUM(effective_chars) OVER ()
       |    AS BIGINT) AS share_pm
       |FROM ef ORDER BY source""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val kept = graft.api.Graft.dedup.dedupCorpus(docs, "doc_id", "text",
        threshold = 0.8, k = graft.operators.Dedup.K,
        bands = graft.operators.Dedup.Bands)
      .select(col("doc_id").as("kept_id"))
    val sm = docs.join(kept, col("doc_id") === col("kept_id"), "left")
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("total_chars"),
        sum(when(col("kept_id").isNotNull, col("n_chars")).otherwise(0L))
          .as("kept_chars"))
      .withColumn("epochs",
        expr("cast(cast(substring(source, 4) as int) % 4 + 1 as bigint)"))
    sm.select(col("source"), col("epochs"), col("kept_chars"),
        (col("epochs") * col("kept_chars")).as("effective_chars"),
        expr("""(1000 * epochs * (total_chars - kept_chars))
               | div (epochs * total_chars)""".stripMargin).as("waste_pm"))
      // whole-frame span over the ~20-row source frame — bounded class
      // (constant partition key declares it)
      .withColumn("total_eff", sum(col("effective_chars")).over(
        Window.partitionBy(graft.functions.Ranks.onePart(col("source")))))
      .withColumn("share_pm", expr("(1000 * effective_chars) div total_eff"))
      .drop("total_eff")
      .orderBy(col("source"))
  }

  def all: Seq[GraftQuery] = Seq(tBpeEncode, tDatasetMix, tDocChunk, tTrainSplit,
    tTokenizerFertility, tEffectiveMix)
}
