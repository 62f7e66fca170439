package graft.plans

import graft.functions.GraftHash
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: exposes the graft expressions to SQL.
  *
  * Register via
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`; afterwards
  * `SELECT graft_shingle_hashes(text)` etc. work from plain SQL —
  * the extension path for engine features that must be reachable from
  * SQL-only clients.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => JaccardPrefilterRule)
  }
}

object GraftExtensions {
  /** Register on an already-constructed session (the class-based hook
    * only applies when the session is first built). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.Shims.registerFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(JaccardPrefilterRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JaccardPrefilterRule
  }

  private def one(name: String)(f: Expression => Expression): (String, Seq[Expression] => Expression) =
    name -> { args =>
      require(args.length == 1, s"$name expects 1 argument")
      f(args.head)
    }
  private def two(name: String)(f: (Expression, Expression) => Expression): (String, Seq[Expression] => Expression) =
    name -> { args =>
      require(args.length == 2, s"$name expects 2 arguments")
      f(args(0), args(1))
    }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    one("graft_char_hash")(CharHashExpr),
    one("graft_shingle_hashes")(ShingleHashExpr),
    one("graft_minhash_signature")(MinHashSignatureExpr(_, GraftHash.perms(32))),
    one("graft_simhash")(SimHashExpr(_, 60)),
    one("graft_band_key")(BandKeyExpr),
    one("graft_norm")(normExpr),
    one("graft_money")(moneyExpr),
    two("graft_jaccard_sorted")(JaccardSortedExpr),
    two("graft_dot_product")(DotProductExpr),
    two("graft_zvalue")(zvalueExpr))

  /** L2 norm: sqrt(dot(v, v)) — the SQL form of functions/Vectors.norm. */
  private[graft] def normExpr(v: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Sqrt
    Sqrt(DotProductExpr(v, v))
  }

  /** The money-parity cast (functions/Parity.m): DECIMAL(15,2), the
    * discipline that makes float aggregates hash-match DuckDB. */
  private[graft] def moneyExpr(c: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    Cast(c, org.apache.spark.sql.types.DecimalType(15, 2))
  }

  /** Morton z-value (16 bits per key, interleaved) as a pure catalyst
    * tree — same bit formula as operators/Layout.zValue (both pinned
    * to z(2,2)=12 by spec). Built from resolved nodes, not Column
    * ops: function-registry builders bypass the Column layer. */
  private[graft] def zvalueExpr(a: Expression, b: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    val al = Cast(a, LongType); val bl = Cast(b, LongType)
    (0 until 16).map { i =>
      val abit = ShiftLeft(BitwiseAnd(ShiftRightUnsigned(al, Literal(i)), Literal(1L)), Literal(2 * i + 1))
      val bbit = ShiftLeft(BitwiseAnd(ShiftRightUnsigned(bl, Literal(i)), Literal(1L)), Literal(2 * i))
      BitwiseOr(abit, bbit)
    }.reduce[Expression](BitwiseOr(_, _))
  }
}
