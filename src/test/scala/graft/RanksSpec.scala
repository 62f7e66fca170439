package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Ranks

/** Ranks.ntileExact must be bit-equal to SQL NTILE for every (n, k)
  * shape — including n < k, heavy ties on the metric (broken by the
  * unique tiebreak), grouped form, and empty input — while never
  * planning a single-partition (unpartitioned) Window. */
class RanksSpec extends SparkSpec {

  private def data(n: Int): DataFrame = {
    import spark.implicits._
    // deterministic metric with many ties (mod 13) so bucket edges
    // land inside tie runs — the case value-based cuts get wrong
    (0 until n).map(i => ((i * 2654435761L) % 13, i.toLong, s"g${i % 3}"))
      .toDF("metric", "id", "grp")
  }

  private def viaWindow(df: DataFrame, k: Int, grouped: Boolean): Seq[(Long, Int)] = {
    val w = if (grouped) Window.partitionBy(col("grp")).orderBy(col("metric"), col("id"))
            else Window.orderBy(col("metric"), col("id"))
    df.select(col("id"), ntile(k).over(w).as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
  }

  private def viaExact(df: DataFrame, k: Int, grouped: Boolean): Seq[(Long, Int)] = {
    val parts = if (grouped) Seq("grp") else Nil
    val out = Ranks.ntileExact(df, k, Seq("metric", "id"), parts, "b")
    try out.select(col("id"), col("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    finally ScopedCache.releaseAll()
  }

  for (n <- Seq(7, 100, 500); k <- Seq(1, 3, 5, 10)) {
    test(s"ntileExact == NTILE (n=$n k=$k ungrouped)") {
      val df = data(n)
      assert(viaExact(df, k, grouped = false) === viaWindow(df, k, grouped = false))
    }
    test(s"ntileExact == NTILE (n=$n k=$k grouped)") {
      val df = data(n)
      assert(viaExact(df, k, grouped = true) === viaWindow(df, k, grouped = true))
    }
  }

  test("ntileExact on empty input returns empty with the bucket column") {
    val out = Ranks.ntileExact(data(0), 5, Seq("metric", "id"), Nil, "b")
    try {
      assert(out.columns.contains("b"))
      assert(out.count() === 0L)
    } finally ScopedCache.releaseAll()
  }

  private def rankViaWindow(df: DataFrame, grouped: Boolean): Seq[(Long, Long)] = {
    val w = if (grouped) Window.partitionBy(col("grp")).orderBy(col("metric"), col("id"))
            else Window.orderBy(col("metric"), col("id"))
    df.select(col("id"), row_number().over(w).cast("long").as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
  }

  for (n <- Seq(7, 100, 500); grouped <- Seq(false, true)) {
    test(s"rankExact == ROW_NUMBER (n=$n grouped=$grouped)") {
      val df = data(n)
      val parts = if (grouped) Seq("grp") else Nil
      val out = Ranks.rankExact(df, Seq("metric", "id"), parts, "r")
      try assert(out.select(col("id"), col("r"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        === rankViaWindow(df, grouped))
      finally ScopedCache.releaseAll()
    }
  }

  test("rankExact plans no unpartitioned Window and ranks via the range shuffle") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val out = Ranks.rankExact(data(200), Seq("metric", "id"), Nil, "r")
    try {
      val bare = out.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bare.isEmpty, "found Window with empty partitionSpec")
      assert(out.queryExecution.executedPlan.toString
        .toLowerCase.contains("rangepartitioning"))
    } finally ScopedCache.releaseAll()
  }

  test("ntileExact plans no unpartitioned Window (the r10 scale-killer)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val out = Ranks.ntileExact(data(200), 5, Seq("metric", "id"), Nil, "b")
    try {
      val bare = out.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bare.isEmpty, "found Window with empty partitionSpec")
      // and the scale mechanism is the range shuffle, visible in the plan
      assert(out.queryExecution.executedPlan.toString
        .toLowerCase.contains("rangepartitioning"))
    } finally ScopedCache.releaseAll()
  }

  private def nullGrpData(n: Int): DataFrame = {
    import spark.implicits._
    // every third row has a NULL group — SQL PARTITION BY puts them
    // in ONE group; the offsets join must not drop them (ADVICE r11)
    (0 until n).map { i =>
      val g = if (i % 3 == 0) None else Some(s"g${i % 2}")
      ((i * 2654435761L) % 13, i.toLong, g)
    }.toDF("metric", "id", "grp")
  }

  test("rankExact keeps and groups NULL partition keys like PARTITION BY (ADVICE r11)") {
    val df = nullGrpData(120)
    val w = Window.partitionBy(col("grp")).orderBy(col("metric"), col("id"))
    val expect = df.select(col("id"), row_number().over(w).cast("long").as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val out = Ranks.rankExact(df, Seq("metric", "id"), Seq("grp"), "r")
    try {
      val got = out.select(col("id"), col("r"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got.size === 120, "null-keyed rows must not be dropped")
      assert(got === expect)
    } finally ScopedCache.releaseAll()
  }

  test("ntileExact keeps and buckets NULL partition keys like PARTITION BY") {
    val df = nullGrpData(90)
    val w = Window.partitionBy(col("grp")).orderBy(col("metric"), col("id"))
    val expect = df.select(col("id"), ntile(4).over(w).as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    val out = Ranks.ntileExact(df, 4, Seq("metric", "id"), Seq("grp"), "b")
    try {
      val got = out.select(col("id"), col("b"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
      assert(got.size === 90)
      assert(got === expect)
    } finally ScopedCache.releaseAll()
  }

  test("percentileExact == the MAX(CASE WHEN rn = ceil(q*n)) window idiom, grouped") {
    val df = data(173)
    val w = Window.partitionBy(col("grp"))
    val r = df.select(col("grp"), col("metric"),
      row_number().over(w.orderBy(col("metric"), col("id"))).as("rn"),
      count(lit(1)).over(w).as("n"))
    val expect = r.groupBy(col("grp"))
      .agg(max(col("n")).as("n"),
        max(when(col("rn") === ceil(lit(0.5) * col("n")).cast("long"),
          col("metric"))).as("p50"),
        max(when(col("rn") === ceil(lit(0.9) * col("n")).cast("long"),
          col("metric"))).as("p90"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSeq.sorted
    val out = Ranks.percentileExact(df, Seq("metric", "id"), Seq("grp"),
      "metric", Seq("p50" -> 0.5, "p90" -> 0.9), nOut = "n")
    try {
      val got = out.collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
        .toSeq.sorted
      assert(got === expect)
    } finally ScopedCache.releaseAll()
  }

  for (n <- Seq(1, 3, 10); grouped <- Seq(false, true)) {
    test(s"topNExact == ROW_NUMBER <= $n (grouped=$grouped), descending metric") {
      val df = data(173)
      val order = Seq(col("metric").desc, col("id"))
      val w = if (grouped) Window.partitionBy(col("grp")).orderBy(order: _*)
              else Window.orderBy(order: _*)
      val expect = df.select(col("id"), row_number().over(w).as("r"))
        .filter(col("r") <= n)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
      val parts = if (grouped) Seq("grp") else Nil
      val out = Ranks.topNExact(df, n, order, parts, "r")
      val got = out.select(col("id"), col("r"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
      assert(got === expect)
    }
  }

  test("topNExact plans no unpartitioned Window over the input frame") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val out = Ranks.topNExact(data(200), 3,
      Seq(col("metric").desc, col("id")), Seq("grp"), "r")
    val bare = out.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(bare.isEmpty, "found Window with empty partitionSpec")
  }

  for (inclusive <- Seq(true, false); grouped <- Seq(false, true)) {
    test(s"prefixSumsExact == running SUM window (inclusive=$inclusive grouped=$grouped)") {
      val df = data(211)
      val base = if (grouped) Window.partitionBy(col("grp")) else Window.partitionBy()
      val w = base.orderBy(col("metric"), col("id"))
        .rowsBetween(Window.unboundedPreceding,
          if (inclusive) Window.currentRow else -1)
      val expect = df.select(col("id"),
          coalesce(sum(col("metric")).over(w), lit(0L)).as("s1"),
          coalesce(sum(col("id") * col("id")).over(w), lit(0L)).as("s2"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      val parts = if (grouped) Seq("grp") else Nil
      val out = Ranks.prefixSumsExact(
        df.withColumn("idsq", col("id") * col("id")),
        Seq("metric", "id"), parts,
        Seq("metric" -> "s1", "idsq" -> "s2"), inclusive = inclusive)
      try {
        val got = out.select(col("id"), col("s1"), col("s2"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
        assert(got === expect)
      } finally ScopedCache.releaseAll()
    }
  }

  test("prefixSumsExact plans no unpartitioned Window and uses the range shuffle") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val out = Ranks.prefixSumsExact(data(200), Seq("metric", "id"), Seq("grp"),
      Seq("metric" -> "s"))
    try {
      val bare = out.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bare.isEmpty, "found Window with empty partitionSpec")
      assert(out.queryExecution.executedPlan.toString
        .toLowerCase.contains("rangepartitioning"))
    } finally ScopedCache.releaseAll()
  }

  test("percentileExact plans no unpartitioned Window and uses the range shuffle") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val out = Ranks.percentileExact(data(200), Seq("metric", "id"), Seq("grp"),
      "metric", Seq("p50" -> 0.5), nOut = "n")
    try {
      val bare = out.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bare.isEmpty, "found Window with empty partitionSpec")
      assert(out.queryExecution.executedPlan.toString
        .toLowerCase.contains("rangepartitioning"))
    } finally ScopedCache.releaseAll()
  }
}
