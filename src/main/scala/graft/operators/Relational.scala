package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.Parity._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The OLAP core: scan/filter/project/join/aggregate/window/sort ops
  * expressed purely with the DataFrame API so Catalyst is free to pick
  * broadcast joins for the small dimensions, push filters/projections
  * into the parquet scans, and run partial (map-side) aggregation.
  *
  * This is the analytics surface an HDFS-resident warehouse offers on
  * top of the reference's raw byte streams (reference scope ends at
  * DFSInputStream.java / DFSOutputStream.java; queries start here).
  */
object Relational {

  private val one = lit(1).cast(DecimalType(4, 2))
  /** revenue := SUM(extendedprice * (1 - discount)), exact. */
  private def revenue =
    sum(m(col("l_extendedprice")) * (one - pct(col("l_discount")))).cast("double")
  private val revenueSql =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"

  val q1PricingSummary: GraftQuery = GraftQuery.sql(
    "q1_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sumMSql("l_quantity")} AS sum_qty,
       |  ${sumMSql("l_extendedprice")} AS sum_base_price,
       |  $revenueSql AS sum_disc_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       |  ${avgMSql("l_quantity")} AS avg_qty,
       |  ${avgMSql("l_extendedprice")} AS avg_price,
       |  ${avgPctSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumM(col("l_quantity")).as("sum_qty"),
        sumM(col("l_extendedprice")).as("sum_base_price"),
        revenue.as("sum_disc_price"),
        sum(m(col("l_extendedprice")) * (one - pct(col("l_discount"))) * (one + pct(col("l_tax"))))
          .cast("double").as("sum_charge"),
        avgM(col("l_quantity")).as("avg_qty"),
        avgM(col("l_extendedprice")).as("avg_price"),
        avgPct(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q3ShippingPriority: GraftQuery = GraftQuery.sql(
    "q3_shipping_priority",
    s"""SELECT l_orderkey, $revenueSql AS revenue, o_orderdate, o_orderpriority
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
  ) { (s, d) =>
    val cutoff = lit("1998-03-15").cast("timestamp")
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d).filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenue.as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q5LocalSupplier: GraftQuery = GraftQuery.sql(
    "q5_local_supplier",
    s"""SELECT n_name, $revenueSql AS revenue
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q6ForecastRevenue: GraftQuery = GraftQuery.sql(
    "q6_forecast_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(
        sum(m(col("l_extendedprice")) * pct(col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q10ReturnedItems: GraftQuery = GraftQuery.sql(
    "q10_returned_items",
    s"""SELECT c_custkey, c_name, $revenueSql AS revenue, c_acctbal, n_name
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(revenue.as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val qTopK: GraftQuery = GraftQuery.sql(
    "q_top_k",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)
  }

  val qGroupTopN: GraftQuery = GraftQuery.sql(
    "q_group_topn",
    """SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey) t
      |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin
  ) { (s, d) =>
    // grouped top-N via Ranks.topNExact: local (segment, slice) top-3
    // then a rerank of the bounded survivors — never a ≤5-partition
    // sort of the whole orders table (the VERDICT r11 hazard class)
    graft.functions.Ranks.topNExact(
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice")),
        n = 3, order = Seq(col("o_totalprice").desc, col("o_orderkey")),
        partCols = Seq("c_mktsegment"), out = "rn")
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  val qDistinct: GraftQuery = GraftQuery.sql(
    "q_distinct",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  val qSemiJoin: GraftQuery = GraftQuery.sql(
    "q_semi_join",
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val qAntiJoin: GraftQuery = GraftQuery.sql(
    "q_anti_join",
    """SELECT n_name, COUNT(*) AS n_customers
      |FROM customer c JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      |GROUP BY n_name ORDER BY n_name""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }

  def all: Seq[GraftQuery] = Seq(
    q1PricingSummary, q3ShippingPriority, q5LocalSupplier, q6ForecastRevenue,
    q10ReturnedItems, qTopK, qGroupTopN, qDistinct, qSemiJoin, qAntiJoin)
}
