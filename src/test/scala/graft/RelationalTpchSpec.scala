package graft

import graft.operators.{Dedup, RelationalTpch}

/** Tranche-5 TPC-H shapes: result sanity at sf0.001 plus the physical
  * plan properties the 100-TB design depends on.
  */
class RelationalTpchSpec extends SparkSpec {

  private def planOf(q: GraftQuery): String =
    q.fn(spark, sfDir).queryExecution.executedPlan.toString

  test("all tranche-5 queries return rows at sf0.001") {
    RelationalTpch.all.foreach { q =>
      assert(q.fn(spark, sfDir).count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("no unbounded cartesian products anywhere in the tranche") {
    // 1-row scalar subqueries surface as BroadcastNestedLoopJoin (a
    // broadcast of one row — fine); CartesianProduct would mean a
    // genuine unblocked pair enumeration.
    RelationalTpch.all.foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
    }
  }

  test("dim joins broadcast; fact-fact inequality joins stay hash-based") {
    assert(planOf(RelationalTpch.q19DisjunctiveBands).contains("BroadcastHashJoin"),
      "q19 should broadcast part into the lineitem scan")
    val q21 = planOf(RelationalTpch.q21WaitingSupplier)
    assert(!q21.contains("BroadcastNestedLoopJoin"),
      "q21's semi/anti joins must key on l_orderkey (equi), not nested-loop")
  }

  test("q2 window-min picks real per-part minima") {
    val rows = RelationalTpch.q2MinCostSupp.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("min_price") > 0)
      assert(r.getAs[Long]("best_supp") >= 0)
    }
    val keys = rows.map(_.getAs[Long]("p_partkey"))
    assert(keys.distinct.length == keys.length, "one row per part expected")
  }

  test("q13 distribution counts every customer exactly once") {
    val total = RelationalTpch.q13CustDistribution.fn(spark, sfDir).collect()
      .map(_.getAs[Long]("custdist")).sum
    val nCust = Tables.customer(spark, sfDir).count()
    assert(total == nCust, s"distribution covers $total of $nCust customers")
  }

  test("hot aggregation and join plans execute inside whole-stage codegen") {
    Seq(
      graft.operators.Relational.q1PricingSummary,
      RelationalTpch.q19DisjunctiveBands,
      RelationalTpch.q17SmallQtyRev).foreach { q =>
      val df = q.fn(spark, sfDir)
      df.collect() // count() would spawn its own query execution; collect finalizes THIS plan
      val plan = df.queryExecution.executedPlan.toString
      // codegen'd operators print with a "*(stageId)" prefix in the
      // final AQE plan string; demand it on the hot aggregate
      // specifically — any trivial codegen'd scan stage would satisfy
      // a bare "*(" check even after the aggregate fell out
      assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(plan).isDefined,
        s"${q.name}'s hash aggregate fell out of whole-stage codegen:\n${plan.take(800)}")
    }
  }

  test("dup clusters equal a local union-find over the near-dup pairs") {
    val pairs = Dedup.dMinhashLsh.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty, "expected injected near-dups at sf0.001")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = nodes.groupBy(find).map { case (root, ms) =>
      (root, ms.length.toLong, ms.max)
    }.toSet
    val got = Dedup.dDupClusters.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("n_members"),
        r.getAs[Long]("max_doc"))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }
}
