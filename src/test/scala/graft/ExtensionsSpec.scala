package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-function surface: a session built with GraftExtensions can
  * reach every custom expression from plain SQL. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSpec.session
    GraftExtensions.register(s) // live-session path; config path covered below
    s
  }

  test("JaccardPrefilterRule injects the implied size bound without changing results") {
    import org.apache.spark.sql.functions._
    import graft.functions.Shingles
    val s = spark // registers rule via experimental.extraOptimizations
    val docs = Tables.documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id"), sort_array(Shingles.shingleHashes(col("text"))).as("sh"))
    val a = docs.select(col("doc_id").as("ida"), col("sh").as("sha"))
    val b = docs.select(col("doc_id").as("idb"), col("sh").as("shb"))
    val pairs = a.join(b, col("ida") < col("idb") && (col("ida") + col("idb")) % 7 === 0)
      .filter(Shingles.jaccardSorted(col("sha"), col("shb")) >= 0.8)
    val optimized = pairs.queryExecution.optimizedPlan.toString
    assert(optimized.contains("least(") && optimized.contains("greatest("),
      s"size-bound prefilter not injected:\n$optimized")
    // results identical to the un-prefiltered builtin formulation
    val got = pairs.select(col("ida"), col("idb")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = a.join(b, col("ida") < col("idb") && (col("ida") + col("idb")) % 7 === 0)
      .filter(Shingles.jaccard(col("sha"), col("shb")) >= 0.8)
      .select(col("ida"), col("idb")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("graft functions are callable from SQL") {
    val r = spark.sql(
      """SELECT graft_char_hash('abc') AS h,
        |  size(graft_shingle_hashes('a b c d')) AS n_sh,
        |  size(graft_minhash_signature(graft_shingle_hashes('a b c d'))) AS k,
        |  graft_simhash(graft_shingle_hashes('a b c d')) AS sim,
        |  graft_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  graft_dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  graft_zvalue(2L, 2L) AS zv
        |""".stripMargin).collect()(0)
    // charHash("abc") = ((7*31+97)*31+98)%P... verified against builtin:
    assert(r.getAs[Long]("h") == graft.plans.GraftExpressions.hashOf("abc"))
    assert(r.getAs[Int]("n_sh") == 2)   // "a b c", "b c d"
    assert(r.getAs[Int]("k") == 32)
    assert(r.getAs[Long]("sim") >= 0)
    assert(math.abs(r.getAs[Double]("j") - 0.5) < 1e-12) // |{2,3}| / |{1,2,3,4}|
    assert(r.getAs[Double]("dp") == 11.0)
    assert(r.getAs[Long]("zv") == 12L) // Morton z(2,2)
  }

  test("band key, norm, and money cast are callable from SQL and match the column API") {
    val r = spark.sql(
      """SELECT graft_band_key(array(5L, 6L, 7L)) AS bk,
        |  graft_norm(array(3.0d, 4.0d)) AS nrm,
        |  graft_money(1.005) AS m,
        |  graft_band_key(slice(graft_minhash_signature(graft_shingle_hashes('a b c d')), 1, 4)) AS bk_sig
        |""".stripMargin).collect()(0)
    // fold (acc*31+c)%P from 0: ((5*31+6)*31+7) = 4998
    assert(r.getAs[Long]("bk") == 4998L)
    assert(r.getAs[Double]("nrm") == 5.0)
    assert(r.getAs[java.math.BigDecimal]("m").toPlainString == "1.01")
    // matches the column-side band key over the same signature slice
    import org.apache.spark.sql.functions._
    import graft.functions.{GraftHash, Shingles}
    val sig = Shingles.shingleHashes(lit("a b c d"))
    val want = spark.range(1).select(
      GraftHash.bandKey((0 until 4).map { j =>
        val (a, b) = GraftHash.perms(32)(j)
        GraftHash.minhashComponent(sig, a, b)
      }).as("bk")).collect()(0).getAs[Long]("bk")
    assert(r.getAs[Long]("bk_sig") == want)
  }

  test("GraftViews exposes operators as graft_* views to SQL-only clients") {
    val s = spark
    graft.api.GraftViews.register(s, "/root/testdata/sf0.001",
      names = Seq("q1_pricing_summary", "lake_restore"))
    // base table + operator views queryable from plain SQL
    assert(s.sql("SELECT COUNT(*) FROM lineitem").collect()(0).getLong(0) > 0)
    val q1 = s.sql(
      "SELECT * FROM graft_q1_pricing_summary WHERE l_returnflag = 'A'").collect()
    assert(q1.nonEmpty && q1.forall(_.getAs[String]("l_returnflag") == "A"))
    assert(s.sql("SELECT COUNT(*) FROM graft_lake_restore").collect()(0).getLong(0) > 0)
    // unknown operator names fail fast, not at first SELECT
    intercept[IllegalArgumentException] {
      graft.api.GraftViews.register(s, "/root/testdata/sf0.001", Seq("nope"))
    }
  }
}
