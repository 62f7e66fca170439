package graft

import graft.operators.RelationalExt

class RelationalExtSpec extends SparkSpec {

  test("every extended relational query runs and returns rows at sf0.001") {
    RelationalExt.all.foreach { q =>
      val n = q.fn(spark, sfDir).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("rollup includes the grand total and per-region subtotals") {
    val rows = RelationalExt.qRollup.fn(spark, sfDir).collect()
    val grand = rows.filter(r =>
      r.getAs[String]("region") == "ALL" && r.getAs[String]("nation") == "ALL")
    assert(grand.length == 1)
    val total = grand(0).getAs[Long]("n_customers")
    val regionSubtotals = rows.filter(r =>
      r.getAs[String]("region") != "ALL" && r.getAs[String]("nation") == "ALL")
    assert(regionSubtotals.map(_.getAs[Long]("n_customers")).sum == total)
  }

  test("running window is monotone per customer") {
    val rows = RelationalExt.qWindowRunning.fn(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      val totals = rs.sortBy(_.getAs[Int]("order_seq")).map(_.getAs[Double]("running_total"))
      assert(totals.zip(totals.tail).forall { case (a, b) => b >= a })
    }
  }

  test("pivot columns cover all event types") {
    val df = RelationalExt.qPivot.fn(spark, sfDir)
    assert(Seq("click", "error", "purchase", "signup", "view").forall(df.columns.contains))
  }

  test("unpivot melts every flag into exactly three measures with recounted values") {
    import org.apache.spark.sql.functions._
    val long = RelationalExt.qUnpivot.fn(spark, sfDir).collect()
    val flags = long.map(_.getAs[String]("l_returnflag")).distinct
    assert(long.length == flags.length * 3)
    flags.foreach { f =>
      val ms = long.filter(_.getAs[String]("l_returnflag") == f)
        .map(_.getAs[String]("measure")).sorted.toSeq
      assert(ms == Seq("disc_price", "price", "qty"))
    }
    // melted qty equals a direct recount of the wide aggregate
    val qty = long.filter(_.getAs[String]("measure") == "qty")
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("value")).toMap
    Tables.lineitem(spark, sfDir).groupBy(col("l_returnflag"))
      .agg(graft.functions.Parity.sumM(col("l_quantity")).as("q")).collect()
      .foreach(r => assert(qty(r.getAs[String]("l_returnflag")) == r.getAs[Double]("q")))
  }

  test("salted heavy-hitter agg equals plain aggregation") {
    import org.apache.spark.sql.functions._
    val salted = RelationalExt.qHeavyHitters.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_events")).toMap
    val plain = Tables.events(spark, sfDir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    salted.foreach { case (u, n) => assert(plain(u) == n) }
  }
}
