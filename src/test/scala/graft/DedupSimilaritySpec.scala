package graft

import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends SparkSpec {

  test("minhash LSH recalls the length-banded jaccard truth pairs") {
    def pairs(q: GraftQuery): Set[(Long, Long)] =
      q.fn(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val truth = pairs(Dedup.dNgramJaccard)
    val lsh = pairs(Dedup.dMinhashLsh)
    assert(truth.nonEmpty, "expected injected near-dups at sf0.001")
    // at j >= 0.8 with 8 bands x 4 rows, recall should be total
    assert(truth.subsetOf(lsh) && lsh.subsetOf(truth),
      s"minhash=${lsh.size} truth=${truth.size} missed=${truth -- lsh} extra=${lsh -- truth}")
  }

  test("simhash near-dup pairs overlap the jaccard truth") {
    val truth = Dedup.dNgramJaccard.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val sim = Dedup.dSimhash.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(sim.nonEmpty, "simhash found no pairs")
    assert((truth intersect sim).size >= truth.size / 2,
      s"simhash recalled only ${(truth intersect sim).size} of ${truth.size}")
  }

  test("exact dedup accounting is consistent") {
    val rows = Dedup.dExactDup.fn(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == r.getAs[Long]("n_unique") + r.getAs[Long]("dup_rows"))
    }
  }

  test("brute-force ANN returns exactly top-k ranked neighbors per query") {
    val rows = Similarity.sAnnBruteforce.fn(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 16)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 5)
      val cos = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN neighbors are a subset of each query's bucket, ranked consistently") {
    val lsh = Similarity.sAnnLsh.fn(spark, sfDir).collect()
    assert(lsh.nonEmpty)
    lsh.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val cos = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("PQ ANN returns top-k per query with non-negative ascending distances") {
    val rows = Similarity.sAnnPq.fn(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 16)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5)
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q), "self must be excluded")
      val d = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("adist"))
      assert(d.forall(_ >= 0.0))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b }, "ADC distances ascend with rank")
    }
  }

  test("embedding near-dup returns 20 globally closest pairs, descending") {
    val rows = Similarity.dEmbedNeardup.fn(spark, sfDir).collect()
    assert(rows.length == 20)
    val cos = rows.map(_.getAs[Double]("cosine"))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
  }
}
