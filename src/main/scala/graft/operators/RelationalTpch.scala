package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.Parity._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifth tranche: the remaining classic TPC-H shapes, adapted to the
  * generated schema (which has no partsupp / l_receiptdate / c_phone —
  * Q2/Q11/Q20 derive supplier-part economics from lineitem history,
  * and Q21's lateness is ship-vs-order date).
  *
  * Scale notes: every dim join is broadcast; every scalar subquery is
  * a broadcast cross join of a 1-row aggregate (no driver collect);
  * per-key "correlated" aggregates are windows or partial-agg joins
  * that shuffle each fact row at most once.
  */
object RelationalTpch {

  private val one = lit(1).cast("decimal(4,2)")
  private def rev = m(col("l_extendedprice")) * (one - pct(col("l_discount")))
  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  /** Q2 flavor: cheapest supplier per part (min observed unit price
    * from lineitem history; the schema has no partsupp). The per-part
    * minimum is a window over the fact — one shuffle on p_partkey,
    * no self-join. */
  val q2MinCostSupp: GraftQuery = GraftQuery.sql(
    "q2_min_cost_supp",
    """WITH up AS (
      |  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price,
      |    MIN(l_extendedprice / l_quantity) OVER (PARTITION BY l_partkey) AS min_price
      |  FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_size = 15)
      |SELECT p_partkey, p_brand, p_type, CAST(MIN(l_suppkey) AS BIGINT) AS best_supp, min_price
      |FROM up JOIN part ON l_partkey = p_partkey
      |WHERE unit_price = min_price
      |GROUP BY p_partkey, p_brand, p_type, min_price
      |ORDER BY p_partkey""".stripMargin
  ) { (s, d) =>
    val p15 = Tables.part(s, d).filter(col("p_size") === 15)
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, d)
      .join(broadcast(p15), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("p_brand"), col("p_type"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      .withColumn("min_price", min(col("unit_price")).over(w))
      .filter(col("unit_price") === col("min_price"))
      .groupBy(col("l_partkey").as("p_partkey"), col("p_brand"), col("p_type"),
        col("min_price"))
      .agg(min(col("l_suppkey")).as("best_supp"))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("best_supp"),
        col("min_price"))
      .orderBy(col("p_partkey"))
  }

  /** Q11 flavor: parts whose shipped value from one region's suppliers
    * exceeds a fraction of that region's total (scalar-subquery
    * threshold; value derived from lineitem, no partsupp). */
  val q11ImportantParts: GraftQuery = GraftQuery.sql(
    "q11_important_parts",
    s"""WITH rv AS (
       |  SELECT l_partkey, SUM($revSql) AS value
       |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'ASIA' GROUP BY l_partkey)
       |SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS value
       |FROM rv
       |WHERE CAST(value AS DOUBLE) >
       |  (SELECT CAST(SUM(value) AS DOUBLE) FROM rv) * 0.001
       |ORDER BY value DESC, p_partkey""".stripMargin
  ) { (s, d) =>
    val asiaSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    // The partial aggregate feeds both the threshold scalar and the
    // final filter — persist it so the fact scan+agg runs once, not
    // once per branch (Catalyst has no cross-subtree CSE). Scoped:
    // released when the query's action completes, so the handle can't
    // pile memory pressure onto later queries.
    val rv = graft.ScopedCache(Tables.lineitem(s, d)
      .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(rev).as("value")))
    val total = rv.agg(sum(col("value")).cast("double").as("grand_total"))
    rv.crossJoin(broadcast(total))
      .filter(col("value").cast("double") > col("grand_total") * 0.001)
      .select(col("l_partkey").as("p_partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** Q13: customer order-count distribution (left outer join with an
    * in-join filter, then a two-level aggregation). */
  val q13CustDistribution: GraftQuery = GraftQuery.sql(
    "q13_cust_distribution",
    """WITH co AS (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |SELECT c_count, COUNT(*) AS custdist
      |FROM co GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15: top supplier by quarterly revenue — partial-agg view + a
    * broadcast scalar max, equality on exact decimal sums. */
  val q15TopSupplier: GraftQuery = GraftQuery.sql(
    "q15_top_supplier",
    s"""WITH rev AS (
       |  SELECT l_suppkey, SUM($revSql) AS total_rev
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
       |FROM supplier JOIN rev ON s_suppkey = l_suppkey
       |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
       |ORDER BY s_suppkey""".stripMargin
  ) { (s, d) =>
    val revBySupp = graft.ScopedCache(Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev).as("total_rev"))) // shared by the max scalar and the equality filter
    val mx = revBySupp.agg(max(col("total_rev")).as("max_rev"))
    revBySupp.join(broadcast(mx), col("total_rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** Q16 flavor: distinct-supplier counts per part attribute group,
    * suppliers observed from lineitem (no partsupp). */
  val q16PartSuppliers: GraftQuery = GraftQuery.sql(
    "q16_part_suppliers",
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin
  ) { (s, d) =>
    val p = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Q17: revenue from small-quantity lines (below 20% of the part's
    * average order quantity) — per-part partial agg join instead of a
    * per-row correlated subquery. */
  val q17SmallQtyRev: GraftQuery = GraftQuery.sql(
    "q17_small_qty_rev",
    """WITH li3 AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#3'),
      |pa AS (
      |  SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM li3 GROUP BY l_partkey)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_lines
      |FROM li3 JOIN pa ON l_partkey = pk
      |WHERE l_quantity < 0.2 * avg_qty""".stripMargin
  ) { (s, d) =>
    val li3 = graft.ScopedCache(Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#3")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice")))
    // ^ brand-filtered lines feed both the per-part average and the final filter
    val pa = li3.groupBy(col("l_partkey").as("pk"))
      .agg((sum(m(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
    li3.join(pa, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        (sum(m(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** Q19: disjunctive brand/size/quantity bands — one scan, the OR of
    * three conjunctive predicates evaluated inside the broadcast-join
    * filter (no union of three scans). */
  val q19DisjunctiveBands: GraftQuery = GraftQuery.sql(
    "q19_disjunctive_bands",
    s"""SELECT CAST(SUM($revSql) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 25)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 35)""".stripMargin
  ) { (s, d) =>
    def band(brand: String, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand &&
        col("p_size").between(1, szHi) && col("l_quantity").between(qLo, qHi)
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .filter(band("Brand#1", 15, 1, 15) || band("Brand#2", 25, 10, 25) ||
        band("Brand#3", 35, 20, 35))
      .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
  }

  /** Q20 flavor: suppliers who shipped a large total of 'red%' parts
    * (HAVING on an exact decimal sum feeding a semi join). */
  val q20QtySuppliers: GraftQuery = GraftQuery.sql(
    "q20_qty_suppliers",
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'red%'
      |  GROUP BY l_suppkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(15,2))) > 2200)
      |ORDER BY s_suppkey""".stripMargin
  ) { (s, d) =>
    val bigRed = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("red%"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(m(col("l_quantity"))).as("q"))
      .filter(col("q") > 2200)
      .select(col("l_suppkey"))
    Tables.supplier(s, d)
      .join(broadcast(bigRed), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** Q21 flavor: suppliers who alone held up multi-supplier orders
    * (late = shipped > 2000 days after order date; EXISTS another
    * supplier's line, NOT EXISTS another supplier's late line — a
    * semi + anti join pair on the same derived fact). */
  val q21WaitingSupplier: GraftQuery = GraftQuery.sql(
    "q21_waiting_supplier",
    """WITH late AS (
      |  SELECT l_orderkey, l_suppkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_shipdate > o_orderdate + INTERVAL 2000 DAY)
      |SELECT s_suppkey, s_name, COUNT(*) AS numwait
      |FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM late l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY s_suppkey, s_name
      |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin
  ) { (s, d) =>
    // feeds both the probe chain and the anti-join build — persist so
    // the heaviest join (lineitem x orders) runs once
    val late = graft.ScopedCache(Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 2000 DAY"))
      .select(col("l_orderkey"), col("l_suppkey")))
    val others = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o2_key"), col("l_suppkey").as("s2_key"))
    val lateOthers = late
      .select(col("l_orderkey").as("o3_key"), col("l_suppkey").as("s3_key"))
    late
      .join(others, col("o2_key") === col("l_orderkey") &&
        col("s2_key") =!= col("l_suppkey"), "left_semi")
      .join(lateOthers, col("o3_key") === col("l_orderkey") &&
        col("s3_key") =!= col("l_suppkey"), "left_anti")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  /** Q22 flavor: wealthy-but-dormant customers per nation — above the
    * positive-balance average (broadcast scalar) with no recent urgent
    * orders (anti join). */
  val q22DormantCustomers: GraftQuery = GraftQuery.sql(
    "q22_dormant_customers",
    """WITH ab AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT n_name, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS totacctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > (SELECT avg_bal FROM ab)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT'
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY n_name ORDER BY n_name""".stripMargin
  ) { (s, d) =>
    val avgBal = Tables.customer(s, d)
      .filter(col("c_acctbal") > 0)
      .agg((sum(m(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    Tables.customer(s, d)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"), sumM(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("n_name"))
  }

  def all: Seq[GraftQuery] = Seq(
    q2MinCostSupp, q11ImportantParts, q13CustDistribution, q15TopSupplier,
    q16PartSuppliers, q17SmallQtyRev, q19DisjunctiveBands, q20QtySuppliers,
    q21WaitingSupplier, q22DormantCustomers)
}
