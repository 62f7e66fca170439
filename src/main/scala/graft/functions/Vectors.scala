package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over Array[Double] columns, built from codegen'd
  * higher-order functions. The fold is strictly left-to-right in both
  * Spark (aggregate) and the DuckDB oracle (list_reduce), so cosine
  * values are bit-identical cross-engine — which makes rank orders
  * (top-k ANN) deterministic and hash-comparable.
  */
object Vectors {

  /** Left-fold dot product. Backed by the JIT'd plans.DotProductExpr;
    * bit-identical to dotBuiltin (asserted in PlansSpec). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Shims
    Shims.column(graft.plans.DotProductExpr(Shims.expression(a), Shims.expression(b)))
  }

  /** Pure-builtin formulation (interpreted HOFs; cross-check ref). */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** DuckDB left-fold dot product (list_reduce seeds with the first
    * element; IEEE 0.0+x == x keeps it identical to Spark's fold). */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  /** Left-fold squared-L2 distance between the m-th subDim-wide
    * subvectors of a and b (product-quantization building block).
    * Same fold discipline as dot: bit-identical to subL2Sql. */
  def subL2(a: Column, b: Column, m: Column, subDim: Int): Column =
    aggregate(
      zip_with(
        slice(a, m * subDim + 1, lit(subDim)),
        slice(b, m * subDim + 1, lit(subDim)),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** DuckDB mirror of subL2 (1-based list indexing, left fold). */
  def subL2Sql(a: String, b: String, m: String, subDim: Int): String =
    s"list_reduce(list_transform(generate_series(1, $subDim), " +
      s"i -> ($a[$m * $subDim + i] - $b[$m * $subDim + i]) * ($a[$m * $subDim + i] - $b[$m * $subDim + i])), " +
      "(x, y) -> x + y)"

  /** Deterministic pseudo-random hyperplane components via an LCG —
    * identical literals embedded on both engine sides (no RNG at
    * runtime, resilient to any library's random implementation). */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    var x = 20240812L
    def next(): Double = {
      x = (x * 1103515245L + 12345L) % 2147483648L
      ((x % 2001L) - 1000L) / 1000.0
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }
}
