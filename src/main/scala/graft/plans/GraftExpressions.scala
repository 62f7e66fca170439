package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text-dedup / vector hot paths.
  *
  * The pure-builtin formulations (transform/aggregate higher-order
  * functions) are semantically identical but interpreted per element —
  * a per-character lambda is ~1000x the cost of one JIT'd loop. These
  * expressions compute the same values (bit-for-bit, same left-fold
  * order; the DuckDB oracles are unchanged) in a single eval call per
  * row. CodegenFallback keeps them out of whole-stage codegen, which
  * is irrelevant here: each call amortizes thousands of operations.
  */
object GraftExpressions {
  val P = 1000000007L
  val Seed = 7L

  /** Driver-side reference implementation of the parity hash. */
  def hashOf(s: String): Long = hashRange(s, 0, s.length, Seed)

  /** Polynomial rolling hash of codepoints — same value as
    * functions.GraftHash.charHash. */
  @inline private[plans] def hashRange(s: String, from: Int, until: Int, init: Long): Long = {
    var h = init
    var i = from
    while (i < until) {
      h = (h * 31 + s.codePointAt(i)) % P
      i += 1
    }
    h
  }
}

/** charHash(text): long — JIT'd form of the parity rolling hash. */
case class CharHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import GraftExpressions._
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_hash"
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    hashRange(s, 0, s.length, Seed)
  }
  override protected def withNewChildInternal(c: Expression): CharHashExpr = copy(child = c)
}

/** shingleHashes(text): array<long> — distinct hashed word-3-grams,
  * first-occurrence order; identical values/order to the builtin
  * split/transform/array_distinct formulation. */
case class ShingleHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import GraftExpressions._
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = s.split(" ", -1)
    if (toks.length < 3) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](toks.length)
    var i = 0
    while (i + 2 < toks.length) {
      // hash of "tok_i tok_{i+1} tok_{i+2}" without building the string
      var h = Seed
      var k = i
      while (k <= i + 2) {
        val t = toks(k)
        h = hashRange(t, 0, t.length, h)
        if (k < i + 2) h = (h * 31 + ' '.toInt) % P
        k += 1
      }
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): ShingleHashExpr = copy(child = c)
}

/** minhashSignature(shingles): array<long> of k components — all k
  * permutation minima in one pass over the shingle set. Same values
  * as k separate array_min(transform(...)) calls. */
case class MinHashSignatureExpr(child: Expression, perms: Seq[(Long, Long)])
    extends UnaryExpression with CodegenFallback {
  import GraftExpressions._
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_signature"
  private val as = perms.map(_._1).toArray
  private val bs = perms.map(_._2).toArray
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toLongArray()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.length) {
      val h = arr(i)
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSignatureExpr = copy(child = c)
}

/** simhash(shingles): long — n-bit SimHash in one pass. Same value as
  * the per-bit aggregate formulation. */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toLongArray()
    val counts = new Array[Long](bits)
    var i = 0
    while (i < arr.length) {
      val h = arr(i)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }
  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(child = c)
}

/** jaccardSorted(a, b): double — exact Jaccard of two SORTED distinct
  * long arrays via a single merge scan (no per-pair hash set). Same
  * value as size(array_intersect)/size(array_union) on the same sets.
  * Callers must sort inputs (sort_array) — set semantics are
  * order-independent, so oracles are unchanged. */
case class JaccardSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_sorted"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    var i = 0; var j = 0; var inter = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    val union = x.length + y.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedExpr =
    copy(left = l, right = r)
}

/** dotProduct(a, b): double — strict left-fold, bit-identical to
  * aggregate(zip_with(a, b, *), 0.0, +) and to the DuckDB oracle's
  * list_reduce fold. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    var acc = 0.0
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}
