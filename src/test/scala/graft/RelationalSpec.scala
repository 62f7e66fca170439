package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows at sf0.001") {
    Relational.all.foreach { q =>
      val df = q.fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("q1 aggregates all flag/status combos with exact sums") {
    val rows = Relational.q1PricingSummary.fn(spark, sfDir).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 0 && total <= 6000)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_qty")
      assert(avg >= 1.0 && avg <= 50.0, s"avg_qty out of range: $avg")
    }
  }

  test("q_top_k is sorted descending and bounded") {
    val rows = Relational.qTopK.fn(spark, sfDir).collect()
    assert(rows.length == 15)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q_group_topn returns at most 3 per segment, rank-ordered") {
    val rows = Relational.qGroupTopN.fn(spark, sfDir).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    bySeg.foreach { case (seg, rs) =>
      assert(rs.length <= 3, s"$seg has ${rs.length} rows")
      val ranks = rs.map(_.getAs[Int]("rn")).sorted
      assert(ranks.sameElements(1 to rs.length))
    }
  }

  test("semi and anti joins partition the customer set") {
    import org.apache.spark.sql.functions._
    val semi = Relational.qSemiJoin.fn(spark, sfDir)
      .agg(sum("n_customers")).collect()(0).getLong(0)
    val anti = Relational.qAntiJoin.fn(spark, sfDir)
      .agg(sum("n_customers")).collect()(0).getLong(0)
    val total = Tables.customer(spark, sfDir).count()
    assert(semi <= total && anti <= total)
  }

  test("broadcast hints reach the physical plan for star joins") {
    val plan = Relational.q5LocalSupplier.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast join for dims")
  }
}
