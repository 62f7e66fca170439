package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word n-gram shingling with cross-engine hash parity.
  *
  * Shingles are hashed with GraftHash.charHash so every downstream
  * dedup primitive (Jaccard, MinHash, SimHash) operates on identical
  * int64 sets in Spark and DuckDB. Documents in the corpus share a
  * small vocabulary, so unigram features barely discriminate — 3-gram
  * shingles are the discriminating unit (and the standard one for
  * near-dup detection in pre-training pipelines).
  */
object Shingles {

  /** Distinct hashed word-3-gram shingles of a text column. Requires
    * >= 3 tokens (callers filter; every corpus doc qualifies).
    * Backed by the JIT'd plans.ShingleHashExpr; value- and
    * order-identical to shingleHashesBuiltin (asserted in PlansSpec). */
  def shingleHashes(text: Column): Column = {
    import org.apache.spark.sql.graft.Shims
    Shims.column(graft.plans.ShingleHashExpr(Shims.expression(text)))
  }

  /** Pure-builtin formulation (interpreted HOFs; cross-check ref). */
  def shingleHashesBuiltin(text: Column): Column = {
    val toks = split(text, " ", -1)
    array_distinct(
      transform(sequence(lit(1), size(toks) - 2), i =>
        GraftHash.charHashBuiltin(concat_ws(" ",
          get(toks, i - 1), get(toks, i), get(toks, i + 1)))))
  }

  /** DuckDB CTE fragment: `source` relation -> (doc_id extras..., sh)
    * with sh = the same distinct shingle-hash list. `source` defaults
    * to the documents table but may name an upstream CTE (e.g. a
    * quality-filtered corpus). */
  def shingleCteSql(extraCols: String = "", source: String = "documents"): String = {
    val shingleExpr = GraftHash.charHashSql("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")
    s"""toks AS (SELECT doc_id$extraCols, string_split(text, ' ') AS toks FROM $source),
       |sh AS (SELECT doc_id$extraCols,
       |  list_distinct(list_transform(generate_series(1, len(toks) - 2), i -> $shingleExpr)) AS sh
       |  FROM toks)""".stripMargin
  }

  /** Exact Jaccard similarity of two distinct-element hash arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Jaccard via one merge scan over pre-sorted arrays — same value,
    * no per-pair hash set (plans.JaccardSortedExpr). */
  def jaccardSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Shims
    Shims.column(graft.plans.JaccardSortedExpr(Shims.expression(a), Shims.expression(b)))
  }

  def jaccardSql(a: String, b: String): String =
    s"CAST(len(list_intersect($a, $b)) AS DOUBLE) / len(list_distinct($a || $b))"
}
