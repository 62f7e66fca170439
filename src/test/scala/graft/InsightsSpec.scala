package graft

import graft.operators.Insights
import org.apache.spark.sql.functions._

class InsightsSpec extends SparkSpec {

  test("every Insights query runs and returns rows at sf0.001") {
    Insights.all.foreach { q =>
      val n = q.fn(spark, sfDir).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("snapshot diff matches the slice construction") {
    val rows = Insights.lakeSnapshotDiff.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("change") -> r.getAs[Long]("n_rows")).toMap
    val o = Tables.orders(spark, sfDir)
    def n(r: Int) = o.filter(col("o_orderkey") % 3 === r).count()
    assert(rows("added") == n(2), "added side should be the mod-2 slice")
    assert(rows("removed") == n(0), "removed side should be the mod-0 slice")
  }

  test("funnel stages are monotonically decreasing and start at the view users") {
    val rows = Insights.qFunnel.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(rows("1_view") >= rows("2_click"))
    assert(rows("2_click") >= rows("3_purchase"))
    val viewers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    assert(rows("1_view") == viewers)
  }

  test("ab test: arm sizes, conversions and the z2 flag recompute from events") {
    val rows = Insights.qAbTest.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
    val na = ev.filter(col("user_id") % 2 === 0).select("user_id").distinct().count()
    val nb = ev.filter(col("user_id") % 2 === 1).select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ctrl") == na && r.getAs[Long]("n_treat") == nb,
        "arm sizes are the global user split for every metric")
      val (xa, xb) = (r.getAs[Long]("conv_ctrl"), r.getAs[Long]("conv_treat"))
      assert(xa <= na && xb <= nb)
      assert(r.getAs[Long]("rate_ctrl_pm") == 1000L * xa / na)
      // the exact cross-multiplied pooled z-squared test, in BigInt
      val (bna, bnb, bxa, bxb) = (BigInt(na), BigInt(nb), BigInt(xa), BigInt(xb))
      val diff = bxa * bnb - bxb * bna
      val lhs = diff * diff * (bna + bnb) * 10000
      val rhs = BigInt(38416) * bna * bnb * (bxa + bxb) * (bna + bnb - bxa - bxb)
      assert(r.getAs[Long]("significant") == (if (lhs > rhs) 1L else 0L))
    }
    // one conversion census recounts directly
    val clicks = ev.filter(col("event_type") === "click" && col("user_id") % 2 === 0)
      .select("user_id").distinct().count()
    assert(rows.find(_.getAs[String]("event_type") == "click").get
      .getAs[Long]("conv_ctrl") == clicks)
  }

  test("cohort cells never exceed the cohort's size and offset 0 equals it") {
    val rows = Insights.qRetentionCohorts.fn(spark, sfDir).collect()
    val size = rows.filter(_.getAs[Long]("offset_day") == 0L)
      .map(r => r.getAs[Long]("cohort_day") -> r.getAs[Long]("n_users")).toMap
    rows.foreach { r =>
      val c = r.getAs[Long]("cohort_day")
      assert(r.getAs[Long]("n_users") <= size(c),
        s"cohort $c cell exceeds its day-0 size")
    }
  }

  test("transition counts sum to events minus one per active user") {
    val total = Insights.qEventTransitions.fn(spark, sfDir)
      .agg(sum("n")).collect()(0).getLong(0)
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(total == expected, s"transitions $total != events - users $expected")
  }

  test("vocab coverage: OOV is a strict nonzero subset of all tokens") {
    val rows = Insights.tVocabCoverage.fn(spark, sfDir).collect()
    val oov = rows.map(_.getAs[Long]("oov_tokens")).sum
    val tot = rows.map(_.getAs[Long]("total_tokens")).sum
    assert(oov > 0, "top-20 vocab should leave an OOV tail on this corpus")
    assert(oov < tot, "OOV must not swallow the whole corpus")
  }

  test("SCD2 intervals chain: eff_to equals the next eff_from per key") {
    val rows = Insights.qScd2.fn(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    rows.foreach { case (_, rs) =>
      // exactly one open (current) interval per key
      assert(rs.count(_.isNullAt(2)) == 1)
    }
  }

  test("sessionize: sessions partition the event stream and indices are contiguous") {
    val rows = Insights.qSessionize.fn(spark, sfDir).collect()
    // every event lands in exactly one session
    val totalEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == totalEvents)
    // per user: session_idx runs 1..K with no holes, durations non-negative
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val idx = rs.map(_.getAs[Long]("session_idx")).sorted.toSeq
      assert(idx == (1L to idx.length.toLong), s"user $u session indices $idx")
      rs.foreach(r => assert(r.getAs[Long]("duration_sec") >= 0L))
    }
    // consecutive sessions of one user are separated by more than the gap
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val byIdx = rs.sortBy(_.getAs[Long]("session_idx"))
      byIdx.sliding(2).foreach {
        case Array(a, b) =>
          val endA = a.getAs[Long]("start_sec") + a.getAs[Long]("duration_sec")
          assert(b.getAs[Long]("start_sec") - endA > Insights.SessionGapSec,
            s"user $u sessions ${a.getAs[Long]("session_idx")} and next not gap-separated")
        case _ => ()
      }
    }
  }

  test("gaps/islands: island totals reconcile with distinct active days") {
    val rows = Insights.qGapsIslands.fn(spark, sfDir).collect()
    val activeDays = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("cast(ts as long) div 86400").as("dy"))
      .distinct().groupBy("user_id").count()
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[Long]("active_days") == activeDays(u))
      assert(r.getAs[Long]("longest_run") <= r.getAs[Long]("active_days"))
      assert(r.getAs[Long]("n_islands") >= 1)
    }
  }

  test("cumulative distinct: running total reconciles with distinct-user recounts") {
    val rows = Insights.qCumulativeDistinct.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cum = rows.map(_.getAs[Long]("cum_users"))
    assert(cum.sliding(2).forall { case Array(x, y) => x <= y; case _ => true },
      "cumulative count must be non-decreasing")
    val totalUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(cum.last == totalUsers, s"final cum ${cum.last} != distinct users $totalUsers")
    assert(rows.map(_.getAs[Long]("new_users")).sum == totalUsers)
    val actives = Tables.events(spark, sfDir)
      .select(expr("cast(ts as long) div 86400").as("dy"), col("user_id")).distinct()
      .groupBy("dy").count().collect()
      .map(r => r.getAs[Long]("dy") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val dy = r.getAs[Long]("dy")
      assert(r.getAs[Long]("active_users") == actives(dy))
      assert(r.getAs[Long]("active_users") <= r.getAs[Long]("cum_users"))
    }
  }

  test("top paths: ordering holds and the head path recounts from raw events") {
    val rows = Insights.qTopPaths.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns.sliding(2).forall { case Array(x, y) => x >= y; case _ => true })
    // driver recount: first three event types per user from raw events
    val byUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (_, evs) =>
        evs.sortBy(r => (graft.streaming.StreamingOps.tsToMicros(
            r.getAs[java.sql.Timestamp]("ts")), r.getAs[Long]("event_id")))
          .take(3).map(_.getAs[String]("event_type")).mkString(">")
      }
    val want = byUser.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(want(r.getAs[String]("path")) == r.getAs[Long]("n_users"))
    }
    // top-20 really is the top of the full distribution
    val cut = rows.map(_.getAs[Long]("n_users")).min
    assert(want.values.count(_ > cut) <= rows.length)
  }

  test("cohort LTV: matrix conserves orders, revenue and customers") {
    val rows = Insights.qCohortLtv.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("offset_q") >= 0L))
    val orders = Tables.orders(spark, sfDir)
    assert(rows.map(_.getAs[Long]("n_orders")).sum == orders.count())
    // exact decimal revenue conservation across the whole matrix
    val totRev = orders.agg(graft.functions.Parity.sumM(col("o_totalprice")))
      .collect()(0).getDouble(0)
    val cellRev = BigDecimal(rows.map(r =>
      BigDecimal(r.getAs[Double]("revenue"))).sum.toString)
    assert(cellRev == BigDecimal(totRev.toString), s"$cellRev != $totRev")
    // every customer's first order lands in their cohort's offset-0 cell
    val custs = orders.select("o_custkey").distinct().count()
    assert(rows.filter(_.getAs[Long]("offset_q") == 0L)
      .map(_.getAs[Long]("n_customers")).sum == custs)
  }

  test("rolling active users: DAU and trailing-7d WAU recount from raw events") {
    val rows = Insights.qRollingActive.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("cast(ts as long) div 86400").as("dy"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("dy")))
    val byDay = ud.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    rows.foreach { r =>
      val dy = r.getAs[Long]("dy")
      val dau = byDay(dy).size.toLong
      val wau = (dy - 6 to dy).flatMap(d => byDay.getOrElse(d, Set.empty))
        .toSet.size.toLong
      assert(r.getAs[Long]("n_dau") == dau, s"day $dy dau")
      assert(r.getAs[Long]("n_wau") == wau, s"day $dy wau")
      assert(r.getAs[Long]("stickiness_pm") == 1000L * dau / wau)
      assert(dau <= wau)
    }
    // a board row for every observed day, none for phantom days
    assert(rows.map(_.getAs[Long]("dy")).toSet == byDay.keySet)
  }

  test("decile migration: matrix conserves customers and replays the ntile deciles") {
    val rows = Insights.qDecileMigration.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // conservation: every customer with >=1 order lands in exactly one cell
    val activeCusts = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == activeCusts)
    // deciles bounded; driver replay of one segment's early-period ntile
    rows.foreach { r =>
      assert(r.getAs[Long]("decile_from") >= 0L && r.getAs[Long]("decile_from") <= 10L)
      assert(r.getAs[Long]("decile_to") >= 0L && r.getAs[Long]("decile_to") <= 10L)
    }
    val spends = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .filter(year(col("o_orderdate")) <= 1997)
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(graft.functions.Parity.sumM(col("o_totalprice")).as("s1"))
      .collect()
    val seg0 = spends.map(_.getString(0)).min
    val inSeg = spends.filter(_.getString(0) == seg0)
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Double]("s1")))
      .sortBy { case (ck, sp) => (sp, ck) }
    // replay NTILE(10): sizes differ by at most 1, larger groups first
    val n = inSeg.length
    val fromCells = rows.filter(r => r.getAs[String]("segment") == seg0 &&
      r.getAs[Long]("decile_from") > 0)
    val total = fromCells.map(_.getAs[Long]("n_customers")).sum
    assert(total == n.toLong, s"segment $seg0 early-active customers")
  }

  test("revenue concentration: Lorenz table conserves revenue and the curve is convex") {
    val rows = Insights.qRevenueConcentration.fn(spark, sfDir).collect()
    assert(rows.length == 10)
    val totalRev = Tables.orders(spark, sfDir)
      .agg(expr("cast(sum(cast(o_totalprice as decimal(15,2)) * 100) as bigint)"))
      .collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("revenue_cents")).sum == totalRev)
    val custs = Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == custs)
    // sorted-ascending deciles: per-decile revenue non-decreasing
    val revs = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Long]("revenue_cents"))
    assert(revs.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    // cumulative curve ends at ~1000 permille and is monotone
    val cum = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Long]("cum_share_pm"))
    assert(cum.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    assert(cum.last >= 999L && cum.last <= 1000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("share_pm") == 1000L * r.getAs[Long]("revenue_cents") / totalRev)
    }
  }

  test("time to convert: percentiles replay from driver-computed latencies") {
    val rows = Insights.qTimeToConvert.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("cast(ts as long)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val segs = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lats = evs.groupBy(_._1).flatMap { case (u, es) =>
      val vs = es.filter(_._2 == "view").map(_._3)
      if (vs.isEmpty) None
      else {
        val v = vs.min
        val ps = es.filter(e => e._2 == "purchase" && e._3 > v).map(_._3)
        if (ps.isEmpty) None else Some((u, segs(u), ps.min - v))
      }
    }.toSeq
    rows.foreach { r =>
      val seg = r.getAs[String]("segment")
      val inSeg = lats.filter(_._2 == seg)
        .sortBy { case (u, _, l) => (l, u) }.map(_._3)
      assert(r.getAs[Long]("n_converted") == inSeg.length.toLong)
      assert(r.getAs[Long]("p50_secs") ==
        inSeg(math.ceil(0.5 * inSeg.length).toInt - 1))
      assert(r.getAs[Long]("p90_secs") ==
        inSeg(math.ceil(0.9 * inSeg.length).toInt - 1))
      assert(r.getAs[Long]("p50_secs") <= r.getAs[Long]("p90_secs"))
    }
  }

  test("rank correlation: Spearman rho recomputes from driver-side ranks") {
    val rows = Insights.qRankCorr.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cust = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(expr("cast(sum(cast(o_totalprice as decimal(15,2)) * 100) as bigint)")
        .as("spend"), count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getAs[Int]("c_nationkey").toLong, r.getAs[Long]("c_custkey"),
        r.getAs[Long]("spend"), r.getAs[Long]("cnt")))
    val names = Tables.nation(spark, sfDir).collect()
      .map(r => r.getAs[Int]("n_nationkey").toLong -> r.getAs[String]("n_name")).toMap
    val byNation = cust.groupBy(_._1)
    rows.foreach { r =>
      val nk = names.collectFirst {
        case (k, v) if v == r.getAs[String]("n_name") => k }.get
      val g = byNation(nk)
      val rs = g.sortBy(c => (c._3, c._2)).zipWithIndex
        .map { case (c, i) => c._2 -> (i + 1L) }.toMap
      val rc = g.sortBy(c => (c._4, c._2)).zipWithIndex
        .map { case (c, i) => c._2 -> (i + 1L) }.toMap
      val sd2 = g.map(c => { val d = BigInt(rs(c._2) - rc(c._2)); d * d }).sum
      val n = BigInt(g.length)
      val m = n * n * n - n
      val expect = if (m == 0) BigInt(1000) else (1000 * (m - 6 * sd2)) / m
      assert(r.getAs[Long]("n_cust") == g.length.toLong)
      assert(r.getAs[Long]("sum_d2") == sd2.toLong)
      assert(r.getAs[Long]("rho_pm") == expect.toLong)
      assert(math.abs(r.getAs[Long]("rho_pm")) <= 1000L)
    }
  }

  test("ab test: significance flag is exact-integer past the old DECIMAL(38,0) bound") {
    import spark.implicits._
    // Independent BigInt evaluation of the same two-regime inequality
    // (BigInt `/` truncates; every operand here is non-negative, so it
    // equals both engines' floor division).
    def expectFlag(na: Long, nb: Long, xa: Long, xb: Long): Long = {
      val (bNA, bNB, bXA, bXB) = (BigInt(na), BigInt(nb), BigInt(xa), BigInt(xb))
      val bN = bNA + bNB
      val (lhs, rhs) =
        if (bN <= 10000000L) {
          val d = bXA * bNB - bXB * bNA
          (d * d * bN * 10000,
            BigInt(38416) * bNA * bNB * (bXA + bXB) * (bN - bXA - bXB))
        } else {
          val s7 = BigInt(10000000)
          val qa = s7 * bXA / bNA
          val qb = s7 * bXB / bNB
          val p = s7 * (bXA + bXB) / bN
          val h = bNA * bNB / bN
          val d = qa - qb
          (BigInt(10000) * d * d * h, BigInt(38416) * p * (s7 - p))
        }
      if (lhs > rhs) 1L else 0L
    }
    val cases = Seq(
      // exact regime (the regime the sf oracles exercise)
      ("small_exact", 1000L, 1000L, 100L, 150L),
      // regime handoff: same clear effect on both sides of N = 1e7
      ("regime_edge_exact", 5000000L, 5000000L, 500000L, 525000L),
      ("regime_edge_rescaled", 5000001L, 5000001L, 500000L, 525000L),
      // past the old ~3e6/arm bound, where the retired form overflowed
      // DECIMAL(38,0): a 5% lift at 1e8/arm MUST read significant
      ("old_bound_effect", 100000000L, 100000000L, 10000000L, 10500000L),
      ("old_bound_flat", 100000000L, 100000000L, 10000000L, 10000000L),
      // beyond int32 populations (xa*nb here would overflow int64 raw)
      ("giant_effect", 4000000000L, 4000000000L, 400000000L, 400400000L),
      ("giant_flat", 4000000000L, 4000000000L, 400000000L, 400000000L),
      // straddle the z-squared = 3.8416 boundary at 2e7/arm
      ("boundary_hi", 20000000L, 20000000L, 1000000L, 1002800L),
      ("boundary_lo", 20000000L, 20000000L, 1000000L, 1002600L),
      // heavy arm skew (small harmonic size h)
      ("skewed", 10000L, 2000000000L, 1000L, 210000000L),
      // degenerate margins: both sides zero, flag down
      ("degenerate_all", 20000000L, 20000000L, 20000000L, 20000000L),
      ("degenerate_none", 20000000L, 20000000L, 0L, 0L))
    val mn = cases.map { case (t, na, nb, xa, xb) => (t, na, nb, xa, xb) }
      .toDF("event_type", "na", "nb", "xa", "xb")
    val got = Insights.abReadout(mn).collect()
      .map(r => r.getAs[String]("event_type") ->
        (if (r.isNullAt(r.fieldIndex("significant"))) null
         else Long.box(r.getAs[Long]("significant")))).toMap
    cases.foreach { case (tag, na, nb, xa, xb) =>
      assert(got(tag) != null, s"$tag: flag must never be NULL")
      assert(got(tag) == expectFlag(na, nb, xa, xb),
        s"$tag: flag disagrees with the BigInt model")
    }
    // the regression VERDICT r12 #1 demands: a large real effect at a
    // population past the old bound reads significant, a flat one not
    assert(got("old_bound_effect") == 1L && got("old_bound_flat") == 0L)
    assert(got("giant_effect") == 1L && got("giant_flat") == 0L)
    // the boundary cases genuinely straddle the threshold
    assert(got("boundary_hi") == 1L && got("boundary_lo") == 0L)
    // both regimes agree on the clear effect at the handoff
    assert(got("regime_edge_exact") == 1L && got("regime_edge_rescaled") == 1L)
  }

  test("rank correlation: rho stays exact at the documented n-cubed edge (1e9 customers)") {
    import spark.implicits._
    val n = BigInt(1000000000L)
    val m = n * n * n - n // 1e27: far beyond int64, inside DECIMAL(38,0)
    def model(n: BigInt, sd2: BigInt): BigInt = {
      val m = n * n * n - n
      if (m == 0) BigInt(1000) else (1000 * (m - 6 * sd2)) / m
    }
    val cases = Seq(
      ("perfect", n, BigInt(0)),
      ("zero", n, m / 6),
      ("anti", n, m / 3),
      ("half", n, m / 12),
      ("singleton", BigInt(1), BigInt(0)))
    val df = cases.map { case (t, nn, sd2) => (t, nn.toLong, sd2.toString) }
      .toDF("tag", "n", "sd2s")
      .withColumn("sd2", expr("cast(sd2s as decimal(38,0))"))
    val got = df.select(col("tag"), expr(Insights.rhoPmSql).as("rho_pm"))
      .collect()
      .map(r => r.getAs[String]("tag") ->
        (if (r.isNullAt(1)) null else Long.box(r.getLong(1)))).toMap
    cases.foreach { case (tag, nn, sd2) =>
      assert(got(tag) != null, s"$tag: rho must never be NULL at the edge")
      assert(got(tag) == model(nn, sd2).toLong,
        s"$tag: rho disagrees with the BigInt model")
    }
    assert(got("perfect") == 1000L && got("anti") == -1000L && got("singleton") == 1000L)
  }

  test("ab test: 300 random count vectors across 9 magnitudes match the BigInt model") {
    import spark.implicits._
    val rnd = new scala.util.Random(1313)
    def expectFlag(na: Long, nb: Long, xa: Long, xb: Long): Long = {
      val (bNA, bNB, bXA, bXB) = (BigInt(na), BigInt(nb), BigInt(xa), BigInt(xb))
      val bN = bNA + bNB
      val (lhs, rhs) =
        if (bN <= 10000000L) {
          val d = bXA * bNB - bXB * bNA
          (d * d * bN * 10000,
            BigInt(38416) * bNA * bNB * (bXA + bXB) * (bN - bXA - bXB))
        } else {
          val s7 = BigInt(10000000)
          val qa = s7 * bXA / bNA; val qb = s7 * bXB / bNB
          val p = s7 * (bXA + bXB) / bN; val h = bNA * bNB / bN
          val d = qa - qb
          (BigInt(10000) * d * d * h, BigInt(38416) * p * (s7 - p))
        }
      if (lhs > rhs) 1L else 0L
    }
    // magnitudes straddling the regime boundary and the old overflow bound
    val mags = Seq(1e2, 1e3, 1e5, 5e6, 1e7, 2e7, 1e8, 1e9, 4e9).map(_.toLong)
    val cases = (0 until 300).map { i =>
      val m = mags(rnd.nextInt(mags.size))
      val na = math.max(1L, m / 2 + (rnd.nextLong(math.max(1L, m / 2))))
      val nb = math.max(1L, m / 2 + (rnd.nextLong(math.max(1L, m / 2))))
      // rates clustered near each other so both flag outcomes occur
      val base = rnd.nextInt(800) + 100 // per-mille
      val xa = math.min(na, na * base / 1000 + rnd.nextLong(math.max(1L, na / 200)))
      val xb = math.min(nb, nb * base / 1000 + rnd.nextLong(math.max(1L, nb / 200)))
      (s"c$i", na, nb, xa, xb)
    }
    val got = Insights.abReadout(
        cases.toDF("event_type", "na", "nb", "xa", "xb"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (if (r.isNullAt(r.fieldIndex("significant"))) null
         else Long.box(r.getAs[Long]("significant")))).toMap
    var ones = 0
    cases.foreach { case (tag, na, nb, xa, xb) =>
      assert(got(tag) != null, s"$tag: NULL flag at na=$na nb=$nb xa=$xa xb=$xb")
      val e = expectFlag(na, nb, xa, xb)
      assert(got(tag) == e, s"$tag: na=$na nb=$nb xa=$xa xb=$xb want $e got ${got(tag)}")
      if (e == 1L) ones += 1
    }
    // the sweep genuinely exercises both outcomes
    assert(ones > 20 && ones < 280, s"degenerate sweep: $ones of 300 flagged")
  }
}
