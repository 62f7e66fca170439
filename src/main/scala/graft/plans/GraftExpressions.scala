package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text-dedup / vector hot paths.
  *
  * The pure-builtin formulations (transform/aggregate higher-order
  * functions) are semantically identical but interpreted per element —
  * a per-character lambda is ~1000x the cost of one JIT'd loop. Each
  * expression here evaluates via one static call into
  * [[GraftRuntime]], and doGenCode emits that same call, so the
  * expressions participate in whole-stage codegen instead of breaking
  * the stage. Values are bit-identical to the builtin formulations
  * (asserted by PlansSpec) and the DuckDB oracles are unchanged.
  */
object GraftExpressions {
  val P: Long = GraftRuntime.P
  val Seed: Long = GraftRuntime.Seed

  /** Driver-side reference implementation of the parity hash. */
  def hashOf(s: String): Long = GraftRuntime.charHash(UTF8String.fromString(s))

  private[plans] val RT = "graft.plans.GraftRuntime"
}

/** charHash(text): long — JIT'd form of the parity rolling hash. */
case class CharHashExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  import GraftExpressions.RT
  override def inputTypes: Seq[org.apache.spark.sql.graft.Shims.AbsType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_hash"
  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.charHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$RT.charHash($c)")
  override protected def withNewChildInternal(c: Expression): CharHashExpr = copy(child = c)
}

/** shingleHashes(text): array<long> — distinct hashed word-3-grams,
  * first-occurrence order; identical values/order to the builtin
  * split/transform/array_distinct formulation. */
case class ShingleHashExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  import GraftExpressions.RT
  override def inputTypes: Seq[org.apache.spark.sql.graft.Shims.AbsType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.shingleHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$RT.shingleHashes($c)")
  override protected def withNewChildInternal(c: Expression): ShingleHashExpr = copy(child = c)
}

/** minhashSignature(shingles): array<long> of k components — all k
  * permutation minima in one pass over the shingle set. */
case class MinHashSignatureExpr(child: Expression, perms: Seq[(Long, Long)])
    extends UnaryExpression with ImplicitCastInputTypes {
  import GraftExpressions.RT
  override def inputTypes: Seq[org.apache.spark.sql.graft.Shims.AbsType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_signature"
  private val as = perms.map(_._1).toArray
  private val bs = perms.map(_._2).toArray
  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.minhashSignature(input.asInstanceOf[ArrayData], as, bs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    defineCodeGen(ctx, ev, c => s"$RT.minhashSignature($c, $asRef, $bsRef)")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSignatureExpr = copy(child = c)
}

/** simhash(shingles): long — n-bit SimHash in one pass. */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression with ImplicitCastInputTypes {
  import GraftExpressions.RT
  override def inputTypes: Seq[org.apache.spark.sql.graft.Shims.AbsType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.simHash(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$RT.simHash($c, $bits)")
  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(child = c)
}

/** bandKey(components): long — (acc*31 + c) % P folded over a MinHash
  * signature slice; equals functions/GraftHash.bandKey column-side and
  * its bandKeySql DuckDB fragment (all three spec-pinned). The SQL
  * user's path to LSH bucket joins:
  * `graft_band_key(slice(sig, band*r+1, r))`. */
case class BandKeyExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  import GraftExpressions.RT
  // getLong over the array slots: an untyped SQL literal array(5,6,7)
  // is array<int> and would read garbage without this cast-or-fail.
  override def inputTypes: Seq[org.apache.spark.sql.graft.Shims.AbsType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_band_key"
  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.bandKey(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$RT.bandKey($c)")
  override protected def withNewChildInternal(c: Expression): BandKeyExpr = copy(child = c)
}

/** jaccardSorted(a, b): double — exact Jaccard of two SORTED distinct
  * long arrays via a single merge scan (no per-pair hash set). */
case class JaccardSortedExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  import GraftExpressions.RT
  override def inputTypes: Seq[org.apache.spark.sql.graft.Shims.AbsType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_sorted"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftRuntime.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$RT.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedExpr =
    copy(left = l, right = r)
}

/** dotProduct(a, b): double — strict left-fold, bit-identical to
  * aggregate(zip_with(a, b, *), 0.0, +) and to the DuckDB oracle's
  * list_reduce fold. NULL on mismatched lengths (malformed embedding
  * data must surface, not silently truncate — matches the zip_with
  * builtin and DuckDB list semantics). */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  import GraftExpressions.RT
  override def inputTypes: Seq[org.apache.spark.sql.graft.Shims.AbsType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else GraftRuntime.dotProduct(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $RT.dotProduct($a, $b);
         |}
       """.stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}
