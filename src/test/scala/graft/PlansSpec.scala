package graft

import graft.functions.{GraftHash, Shingles, Vectors}
import graft.plans.GraftExpressions
import org.apache.spark.sql.functions._

/** The custom Catalyst expressions must be value-identical to the
  * pure-builtin formulations they replace (the DuckDB oracles were
  * validated against the builtins). */
class PlansSpec extends SparkSpec {

  test("CharHashExpr == builtin charHash on every document") {
    val diff = Tables.documents(spark, sfDir)
      .select(GraftHash.charHash(col("text")).as("fast"),
        GraftHash.charHashBuiltin(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("ShingleHashExpr == builtin shingles (values and order) on every document") {
    val diff = Tables.documents(spark, sfDir)
      .select(Shingles.shingleHashes(col("text")).as("fast"),
        Shingles.shingleHashesBuiltin(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("DotProductExpr == builtin fold dot on embedding pairs") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val diff = a.join(b, col("ia") < col("ib")).limit(50000)
      .select(Vectors.dot(col("va"), col("vb")).as("fast"),
        Vectors.dotBuiltin(col("va"), col("vb")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("MinHashSignatureExpr == per-component array_min formulation") {
    import org.apache.spark.sql.graft.Shims
    val perms = GraftHash.perms(operators.Dedup.K)
    val sh = Tables.documents(spark, sfDir)
      .select(Shingles.shingleHashes(col("text")).as("sh"))
    val sig = Shims.column(graft.plans.MinHashSignatureExpr(Shims.expression(col("sh")), perms))
    val ref = array(perms.map { case (a, b) => GraftHash.minhashComponent(col("sh"), a, b) }: _*)
    val diff = sh.select(sig.as("fast"), ref.as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("CharHashExpr == builtin charHash on non-BMP text (surrogate pairs)") {
    import spark.implicits._
    val df = Seq("a𝄞b", "𝄞", "héllo wörld", "🎼🎶 mixed 音楽 text", "").toDF("text")
    val rows = df.select(GraftHash.charHash(col("text")).as("fast"),
      GraftHash.charHashBuiltin(col("text")).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("DotProductExpr returns NULL on mismatched vector lengths (no silent truncation)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0)),
                 (Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val rows = df.select(Vectors.dot(col("a"), col("b")).as("d"),
      Vectors.dotBuiltin(col("a"), col("b")).as("ref")).collect()
    assert(rows(0).isNullAt(0))        // mismatched → NULL
    assert(rows(1).getDouble(0) == 11.0)
  }

  test("MinHashAggExpr yields NULL for groups with no non-null input (MIN-of-empty semantics)") {
    import org.apache.spark.sql.graft.Shims
    import spark.implicits._
    val df = Seq(("g1", Some(Array(5L, 6L))), ("g2", None), ("g1", Some(Array(3L, 9L))))
      .toDF("g", "sig")
    val out = df.groupBy(col("g"))
      .agg(Shims.column(graft.plans.MinHashAggExpr(
        Shims.expression(col("sig")), 2).toAggregateExpression()).as("msig"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(out("g2") == null)
    assert(out("g1") == Seq(3L, 6L))
  }

  test("SimHashExpr bits stay within configured width") {
    import org.apache.spark.sql.graft.Shims
    val sh = Tables.documents(spark, sfDir)
      .select(Shingles.shingleHashes(col("text")).as("sh"))
    val sims = sh.select(Shims.column(graft.plans.SimHashExpr(
      Shims.expression(col("sh")), operators.Dedup.SimBits)).as("s")).collect()
    sims.foreach { r =>
      val v = r.getLong(0)
      assert(v >= 0 && v < (1L << operators.Dedup.SimBits))
    }
  }
}
