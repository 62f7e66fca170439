package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.Parity._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second tranche of the OLAP core (SURVEY.md §2): window functions,
  * grouping sets (rollup/cube), pivot, set ops, subqueries, outer
  * joins, sketches, and the explicit two-phase heavy-hitter pattern.
  */
object RelationalExt {

  /** Running per-customer order total — window frame, deterministic
    * via unique (o_custkey, o_orderdate, o_orderkey) ordering. Exact
    * decimal running sum surfaced as double. */
  val qWindowRunning: GraftQuery = GraftQuery.sql(
    "q_window_running",
    """SELECT o_orderkey, o_custkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
      |FROM orders WHERE o_custkey < 200
      |ORDER BY o_custkey, order_seq""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_custkey") < 200)
      .select(col("o_orderkey"), col("o_custkey"),
        sum(m(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"),
        row_number().over(w).as("order_seq"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  /** lag/lead deltas per user over the event stream. Double subtraction
    * of identical inputs is bit-deterministic — no decimal needed. */
  val qWindowLag: GraftQuery = GraftQuery.sql(
    "q_window_lag",
    """SELECT event_id, user_id, value,
      |  value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_prev,
      |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |FROM events WHERE user_id < 50
      |ORDER BY user_id, event_id""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .filter(col("user_id") < 50)
      .select(col("event_id"), col("user_id"), col("value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta_prev"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Hierarchical rollup region → nation; grouping-null keys surfaced
    * as 'ALL' so null semantics can't diverge between engines. */
  val qRollup: GraftQuery = GraftQuery.sql(
    "q_rollup",
    s"""SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
       |  COUNT(*) AS n_customers, ${sumMSql("c_acctbal")} AS total_acctbal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY region, nation""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), sumM(col("c_acctbal")).as("total_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("total_acctbal"))
      .orderBy(col("region"), col("nation"))
  }

  /** Cube over returnflag × linestatus. */
  val qCube: GraftQuery = GraftQuery.sql(
    "q_cube",
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       |  COALESCE(l_linestatus, 'ALL') AS linestatus,
       |  COUNT(*) AS n_rows, ${sumMSql("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), sumM(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_rows"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** HLL sketch EVALUATED against the exact answer — at 100 TB the
    * sketch replaces exact distinct wherever a few percent error is
    * acceptable (no shuffle of the full key set, constant memory per
    * group, mergeable partials). The sketch itself has no cross-engine
    * parity (HLL register layouts differ), so the gate checks what IS
    * deterministic: the exact counts, plus a within-10%-of-exact flag
    * for each sketch (HLL is partition-order-independent — max per
    * register — so the flag is stable at any parallelism; default rsd
    * 0.05, flag at 2 rsd). This upgraded the entry from rows-only to
    * a full schema+hash gate (r7 verdict #6). */
  val qApproxDistinct: GraftQuery = GraftQuery.sql(
    "q_approx_distinct",
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  TRUE AS parts_within_10pct, TRUE AS orders_within_10pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
        (abs(col("approx_parts") - col("exact_parts")) * 10
          <= col("exact_parts")).as("parts_within_10pct"),
        (abs(col("approx_orders") - col("exact_orders")) * 10
          <= col("exact_orders")).as("orders_within_10pct"))
      .orderBy(col("l_returnflag"))
  }

  /** Full outer join of per-nation premium customer/supplier counts. */
  val qOuterJoin: GraftQuery = GraftQuery.sql(
    "q_outer_join",
    """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
      |           FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
      |     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
      |           FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey)
      |SELECT COALESCE(c.nk, s.nk) AS nationkey,
      |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      |FROM c FULL OUTER JOIN s ON c.nk = s.nk
      |ORDER BY nationkey""".stripMargin
  ) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("c_nk")).agg(count(lit(1)).as("n_cust"))
    val sup = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
      .groupBy(col("s_nationkey").as("s_nk")).agg(count(lit(1)).as("n_supp"))
    c.join(sup, col("c_nk") === col("s_nk"), "full_outer")
      .select(
        coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** Orders above the global average price — scalar subquery. */
  val qScalarSubquery: GraftQuery = GraftQuery.sql(
    "q_scalar_subquery",
    """SELECT o_orderstatus, COUNT(*) AS n_above_avg
      |FROM orders
      |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) FROM orders)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    // Scalar subquery as a broadcast join — one distributed job, no
    // driver collect, the literal never baked into the plan (the
    // scale-safe shape; cf. q11/q15/q22 in RelationalTpch).
    val avg = o.agg(avgM(col("o_totalprice")).as("avg_price"))
    o.crossJoin(broadcast(avg))
      .filter(col("o_totalprice") > col("avg_price"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_above_avg"))
      .orderBy(col("o_orderstatus"))
  }

  /** UNION / EXCEPT / INTERSECT over two customer cohorts. */
  val qSetops: GraftQuery = GraftQuery.sql(
    "q_setops",
    """WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |     big AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000)
      |SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT * FROM b UNION SELECT * FROM big) t
      |UNION ALL
      |SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT * FROM b EXCEPT SELECT * FROM big) t
      |UNION ALL
      |SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT * FROM b INTERSECT SELECT * FROM big) t
      |ORDER BY op""".stripMargin
  ) { (s, d) =>
    val b = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("c_custkey")).distinct()
    val u = b.union(big).distinct().agg(count(lit(1)).as("n"))
      .select(lit("union").as("op"), col("n"))
    val e = b.except(big).agg(count(lit(1)).as("n"))
      .select(lit("except").as("op"), col("n"))
    val i = b.intersect(big).agg(count(lit(1)).as("n"))
      .select(lit("intersect").as("op"), col("n"))
    u.union(e).union(i).orderBy(col("op"))
  }

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot event_type → columns of exact value sums per day. */
  val qPivot: GraftQuery = GraftQuery.sql(
    "q_pivot",
    s"""SELECT CAST(ts AS DATE) AS day,
       |${eventTypes.map(t => s"  CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(15,2)) END) AS DOUBLE) AS $t").mkString(",\n")}
       |FROM events GROUP BY CAST(ts AS DATE) ORDER BY day""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .withColumn("day", col("ts").cast("date"))
      .groupBy(col("day"))
      .pivot("event_type", eventTypes)
      .agg(sum(m(col("value"))).cast("double"))
      .orderBy(col("day"))
  }

  /** String expression library over part names/brands. */
  val qStringFuncs: GraftQuery = GraftQuery.sql(
    "q_string_funcs",
    """SELECT CAST(regexp_extract(p_brand, '#(\d+)', 1) AS BIGINT) AS brand_num,
      |  COUNT(*) AS n_parts,
      |  MIN(upper(p_type)) AS min_type,
      |  MAX(substr(p_name, 1, 8)) AS name_prefix,
      |  CAST(SUM(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END) AS BIGINT) AS n_with_a,
      |  CAST(SUM(length(p_name)) AS BIGINT) AS total_name_len
      |FROM part GROUP BY 1 ORDER BY brand_num""".stripMargin
  ) { (s, d) =>
    Tables.part(s, d)
      .groupBy(regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("long").as("brand_num"))
      .agg(
        count(lit(1)).as("n_parts"),
        min(upper(col("p_type"))).as("min_type"),
        max(substring(col("p_name"), 1, 8)).as("name_prefix"),
        sum(when(col("p_name").like("%a%"), 1).otherwise(0)).as("n_with_a"),
        sum(length(col("p_name"))).as("total_name_len"))
      .orderBy(col("brand_num"))
  }

  /** Date/time expression library over orders. */
  val qDateFuncs: GraftQuery = GraftQuery.sql(
    "q_date_funcs",
    s"""SELECT EXTRACT(year FROM o_orderdate) AS yr, EXTRACT(quarter FROM o_orderdate) AS qtr,
       |  COUNT(*) AS n_orders, ${sumMSql("o_totalprice")} AS total,
       |  MIN(CAST(o_orderdate AS DATE)) AS first_day,
       |  MAX(CAST(o_orderdate + INTERVAL 30 DAY AS DATE)) AS max_due
       |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr"))
      .agg(
        count(lit(1)).as("n_orders"),
        sumM(col("o_totalprice")).as("total"),
        min(col("o_orderdate").cast("date")).as("first_day"),
        max((col("o_orderdate") + expr("INTERVAL 30 DAY")).cast("date")).as("max_due"))
      .orderBy(col("yr"), col("qtr"))
  }

  /** Heavy hitters with an explicit salt stage: partial counts on
    * (key, salt) then final merge — the skew-proof shape for power-law
    * keys at 100 TB (a single hot user never lands on one reducer).
    * Result is identical to the plain aggregate, which the oracle
    * verifies. */
  val qHeavyHitters: GraftQuery = GraftQuery.sql(
    "q_heavy_hitters",
    s"""SELECT user_id, COUNT(*) AS n_events, ${sumMSql("value")} AS total_value
       |FROM events GROUP BY user_id
       |ORDER BY n_events DESC, user_id LIMIT 25""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(m(col("value"))).as("pv"))
      .groupBy(col("user_id"))
      .agg(sum(col("pc")).as("n_events"), sum(col("pv")).cast("double").as("total_value"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(25)
  }

  /** Per-segment balance deciles via ntile — equal-height bucketing
    * with the remainder-to-leading-buckets semantics both engines
    * share. Buckets come from [[graft.functions.Ranks.ntileExact]]
    * (range shuffle + broadcast slice offsets): with a ≤5-cardinality
    * segment key, a plain segment-partitioned NTILE window would
    * funnel the whole customer table through ≤5 sort tasks at scale
    * (the VERDICT r11 hazard class); unique (c_acctbal, c_custkey)
    * ordering keeps bucket boundaries deterministic; min/max of
    * doubles are order-independent. */
  val qNtileDeciles: GraftQuery = GraftQuery.sql(
    "q_ntile_deciles",
    """WITH t AS (
      |  SELECT c_mktsegment, c_acctbal,
      |    NTILE(10) OVER (PARTITION BY c_mktsegment
      |                    ORDER BY c_acctbal, c_custkey) AS decile
      |  FROM customer)
      |SELECT c_mktsegment, decile, COUNT(*) AS n,
      |  MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
      |FROM t GROUP BY c_mktsegment, decile
      |ORDER BY c_mktsegment, decile""".stripMargin
  ) { (s, d) =>
    graft.functions.Ranks.ntileExact(
        Tables.customer(s, d)
          .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey")),
        k = 10, orderCols = Seq("c_acctbal", "c_custkey"),
        partCols = Seq("c_mktsegment"), out = "decile")
      .groupBy(col("c_mktsegment"), col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
      .orderBy(col("c_mktsegment"), col("decile"))
  }

  /** Salted skew join: ~90% of events hash to one dimension key, the
    * classic power-law join hotspot. The fact side salts each row
    * (pmod of a uniform column) and the dimension replicates once per
    * salt, turning 1 hot partition into 16 uniform ones; the result is
    * provably identical to the plain join the oracle runs. At 100 TB
    * this is the manual fallback when AQE skew splitting can't help
    * (e.g. skewed build side of a broadcast-ineligible join). */
  val qSkewJoinSalted: GraftQuery = GraftQuery.sql(
    "q_skew_join_salted",
    s"""SELECT r_name, COUNT(*) AS n, ${sumMSql("value")} AS total
       |FROM events JOIN region
       |  ON r_regionkey = (CASE WHEN user_id % 10 < 9 THEN 0 ELSE (user_id // 10) % 5 END)
       |GROUP BY r_name ORDER BY r_name""".stripMargin
  ) { (s, d) =>
    val Salts = 16
    val hotKey = when(col("user_id") % 10 < 9, lit(0L))
      .otherwise(expr("(user_id div 10) % 5"))
    val fact = Tables.events(s, d)
      .select(col("value"), hotKey.as("rk"),
        pmod(col("event_id"), lit(Salts)).cast("int").as("salt"))
    val dim = Tables.region(s, d)
      .select(col("r_regionkey").cast("long").as("dk"), col("r_name"))
      .withColumn("dsalt", explode(sequence(lit(0), lit(Salts - 1))))
    // shuffle_hash hint: the tiny demo dim would auto-broadcast (where
    // skew is moot) — force the shuffled path the technique targets.
    fact.join(dim.hint("shuffle_hash"), col("rk") === col("dk") && col("salt") === col("dsalt"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n"), sumM(col("value")).as("total"))
      .orderBy(col("r_name"))
  }

  /** Explicit GROUPING SETS beyond rollup/cube — exercised through the
    * spark.sql entry path (temp view + SQL text) to pin that surface;
    * grouping-null keys COALESCE to 'ALL' per the parity discipline. */
  val qGroupingSets: GraftQuery = GraftQuery.sql(
    "q_grouping_sets",
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |  COALESCE(l_linestatus, 'ALL') AS ls,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
      |ORDER BY rf, ls""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem_gs")
    s.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS qty
        |FROM graft_lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY rf, ls""".stripMargin)
  }

  /** Value-distribution histogram: fixed-width bins by explicit
    * floor-division (identical IEEE arithmetic in both engines —
    * width_bucket is not portable to the oracle). The profiling
    * primitive behind stats collection and skew diagnosis. */
  val qHistogram: GraftQuery = GraftQuery.sql(
    "q_histogram",
    s"""SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
       |  COUNT(*) AS n, ${sumMSql("o_totalprice")} AS total
       |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), sumM(col("o_totalprice")).as("total"))
      .orderBy(col("bucket"))
  }

  /** UNPIVOT (melt): wide per-flag measure columns back to long
    * (measure, value) rows — the inverse of q_pivot and the missing
    * half of the reshape surface. Spark expresses it with the
    * codegen'd `stack` generator over the 6-row aggregate (the melt
    * runs on the AGGREGATE, so at 100 TB the wide frame is
    * group-count-sized and the reshape is free — never melt the fact
    * table when the measure is associative). Values are exact decimal
    * sums surfaced as double (Parity discipline); the oracle spells
    * the same melt as UNION ALL, the portable ANSI form. */
  val qUnpivot: GraftQuery = GraftQuery.sql(
    "q_unpivot",
    s"""WITH a AS (SELECT l_returnflag,
       |    ${sumMSql("l_quantity")} AS qty,
       |    ${sumMSql("l_extendedprice")} AS price,
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS disc_price
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, 'disc_price' AS measure, disc_price AS value FROM a
       |UNION ALL
       |SELECT l_returnflag, 'price', price FROM a
       |UNION ALL
       |SELECT l_returnflag, 'qty', qty FROM a
       |ORDER BY l_returnflag, measure""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val one = lit(1).cast(DecimalType(4, 2))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        sumM(col("l_quantity")).as("qty"),
        sumM(col("l_extendedprice")).as("price"),
        sum(m(col("l_extendedprice")) * (one - pct(col("l_discount"))))
          .cast("double").as("disc_price"))
      .selectExpr("l_returnflag",
        "stack(3, 'disc_price', disc_price, 'price', price, 'qty', qty) AS (measure, value)")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  def all: Seq[GraftQuery] = Seq(
    qWindowRunning, qWindowLag, qRollup, qCube, qApproxDistinct, qOuterJoin,
    qScalarSubquery, qSetops, qPivot, qStringFuncs, qDateFuncs, qHeavyHitters,
    qNtileDeciles, qSkewJoinSalted, qGroupingSets, qHistogram, qUnpivot)
}
