package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine text hashing.
  *
  * The engine's fast path for fingerprints/MinHash at scale is
  * xxhash64 (codegen'd, vectorized). But xxhash64 has no DuckDB
  * equivalent, so oracle-checked queries use `charHash`: a polynomial
  * rolling hash over codepoints, h = fold((h*31 + cp) mod P), built
  * entirely from codegen'd higher-order functions on the Spark side
  * and list lambdas on the DuckDB side — bit-identical results in
  * both engines (all intermediates < 2^35, no overflow in either).
  *
  * This mirrors the reference's design split between fast transfer
  * checksums and verifiable end-to-end checksums
  * (hdfs/protocol/DataTransferProtocol.java CRC frames vs
  * DistributedFileSystem.getFileChecksum MD5-of-CRC).
  */
object GraftHash {
  val P = 1000000007L
  val Seed = 7L

  /** Parity rolling hash of a string column (oracle-verifiable).
    * Backed by the JIT'd plans.CharHashExpr; value-identical to
    * charHashBuiltin (asserted in PlansSpec). */
  def charHash(c: Column): Column = {
    import org.apache.spark.sql.graft.Shims
    Shims.column(graft.plans.CharHashExpr(Shims.expression(c)))
  }

  /** Pure-builtin formulation (interpreted HOFs; kept as the
    * cross-check reference for the custom expression). */
  def charHashBuiltin(c: Column): Column =
    aggregate(
      // split("", "") yields [""] (not []) — drop empties so the empty
      // string folds zero steps, matching DuckDB string_split and the
      // custom expression.
      transform(filter(split(c, ""), ch => length(ch) > lit(0)),
        ch => ascii(ch).cast("long")),
      lit(Seed),
      (h, cp) => (h * 31 + cp) % P)

  /** DuckDB SQL computing exactly charHash(expr). */
  def charHashSql(e: String): String =
    s"list_reduce(list_prepend($Seed::BIGINT, list_transform(string_split($e, ''), ch -> ord(ch)::BIGINT)), (h, c) -> (h * 31 + c) % $P)"

  /** Fast-path 64-bit hash for production scale (no oracle parity). */
  def fastHash(c: Column): Column = xxhash64(c)

  /** k MinHash permutation constants (a, b): fixed, embedded in both
    * engines. a is odd and nonzero mod P. */
  def perms(k: Int): Seq[(Long, Long)] =
    (0 until k).map { j =>
      val a = (j.toLong * 2654435761L + 2654435769L) % P
      val b = (j.toLong * 40503L + 17L) % P
      (if (a == 0) 1L else a, b)
    }

  /** One MinHash signature component: min over hashes of (a*h+b)%P.
    * Inputs are charHash values (< P), so a*h < ~1e18 — safe in both
    * engines' int64. */
  def minhashComponent(hashes: Column, a: Long, b: Long): Column =
    array_min(transform(hashes, h => (h * a + b) % P))

  def minhashComponentSql(hashesExpr: String, a: Long, b: Long): String =
    s"list_min(list_transform($hashesExpr, h -> (h * $a + $b) % $P))"

  /** Combine r signature components into one band key. Components are
    * < P (~2^30); ((x*31+y) stays < 2^35 before each mod. */
  def bandKey(components: Seq[Column]): Column =
    components.reduce((acc, c) => (acc * 31 + c) % P)

  def bandKeySql(components: Seq[String]): String =
    components.reduce((acc, c) => s"(($acc) * 31 + $c) % $P")
}
