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

  test("graft functions are callable from SQL") {
    val r = spark.sql(
      """SELECT graft_char_hash('abc') AS h,
        |  size(graft_shingle_hashes('a b c d')) AS n_sh,
        |  size(graft_minhash_signature(graft_shingle_hashes('a b c d'))) AS k,
        |  graft_simhash(graft_shingle_hashes('a b c d')) AS sim,
        |  graft_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  graft_dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp
        |""".stripMargin).collect()(0)
    // charHash("abc") = ((7*31+97)*31+98)%P... verified against builtin:
    assert(r.getAs[Long]("h") == graft.plans.GraftExpressions.hashOf("abc"))
    assert(r.getAs[Int]("n_sh") == 2)   // "a b c", "b c d"
    assert(r.getAs[Int]("k") == 32)
    assert(r.getAs[Long]("sim") >= 0)
    assert(math.abs(r.getAs[Double]("j") - 0.5) < 1e-12) // |{2,3}| / |{1,2,3,4}|
    assert(r.getAs[Double]("dp") == 11.0)
  }
}
