package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fourth tranche: the remaining classic TPC-H query shapes expressible
  * on this schema — correlated aggregates, IN/decorrelated subqueries,
  * disjunctive pushdown, left-join zero-count distributions, share-of-
  * total reports.
  */
object Relational4 {

  private def revenue = sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double")

  /** Q7-style volume shipping between two nations (both directions). */
  def volumeShipping(t: Tables): DataFrame = {
    val n1 = t.nation.select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = t.nation.select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .where(
        ((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")) &&
          col("l_shipdate").between(
            lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(revenue.as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val volumeShippingSql: String =
    """SELECT supp_nation, cust_nation, l_year,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) AS DOUBLE) AS revenue
      |FROM (
      | SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS l_year, l_extendedprice, l_discount
      | FROM lineitem, orders, customer, supplier, nation n1, nation n2
      | WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND l_suppkey = s_suppkey AND s_nationkey = n1.n_nationkey
      |  AND c_nationkey = n2.n_nationkey
      |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                     AND TIMESTAMP '1997-12-31 00:00:00')
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q8-style market share: one nation's share of regional revenue per
    * year — share-of-total from exact decimal sums.
    */
  def marketShare(t: Tables): DataFrame = {
    val n1 = t.nation.select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val base = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .where(col("o_orderdate").between(
        lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
    base
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_3",
          discPrice(col("l_extendedprice"), col("l_discount")))).cast("double") /
          sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double"))
          .as("mkt_share"))
      .orderBy("o_year")
  }

  val marketShareSql: String =
    """SELECT o_year,
      | CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DOUBLE)
      |   / CAST(SUM(volume) AS DOUBLE) AS mkt_share
      |FROM (
      | SELECT CAST(year(o_orderdate) AS INT) AS o_year, n1.n_name AS supp_nation,
      |  CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4)) AS volume
      | FROM lineitem, orders, customer, supplier, nation n1, nation n2, region
      | WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND l_suppkey = s_suppkey AND s_nationkey = n1.n_nationkey
      |  AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                      AND TIMESTAMP '1997-12-31 00:00:00')
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** Q10-style returned-item report: top 20 customers by lost revenue. */
  def returnedItems(t: Tables): DataFrame =
    t.lineitem.where(col("l_returnflag") === "R")
      .join(t.orders.where(
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  val returnedItemsSql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) AS DOUBLE) AS revenue
      |FROM lineitem, orders, customer, nation
      |WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
      |  AND o_custkey = c_custkey AND c_nationkey = n_nationkey
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Q13-style customer order-count distribution, including customers
    * with zero orders (left join → conditional count → histogram).
    */
  def custDistribution(t: Tables): DataFrame =
    t.customer
      .join(t.orders.where(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val custDistributionSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      | SELECT c_custkey, COUNT(o_orderkey) AS c_count
      | FROM customer LEFT JOIN orders
      |   ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      | GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q14-style promo revenue share (conditional share-of-total). */
  def promoRevenue(t: Tables): DataFrame =
    t.lineitem
      .where(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO",
          discPrice(col("l_extendedprice"), col("l_discount")))).cast("double") /
          sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double"))
          .as("promo_revenue_pct"))

  val promoRevenueSql: String =
    """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume END) AS DOUBLE)
      |   / CAST(SUM(volume) AS DOUBLE) AS promo_revenue_pct
      |FROM (
      | SELECT p_type,
      |  CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4)) AS volume
      | FROM lineitem, part
      | WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')""".stripMargin

  /** Q17-style small-quantity revenue: lineitems below 20% of their
    * part's average quantity — a correlated aggregate, decorrelated into
    * a broadcast join against the per-part averages.
    *
    * Scale note: only Brand#1 parts (~4% of `part`) can survive the
    * final join, and the average is PER PART — computed from that part's
    * own rows only — so lineitem is broadcast-semi-joined to the
    * qualifying part keys BEFORE the per-part aggregation. The groupBy
    * then shuffles ~1/25 of the fact table instead of all of it, and the
    * same pruned scan feeds both the aggregate and the probe side.
    */
  def smallQtyRevenue(t: Tables): DataFrame = {
    val brandParts = t.part.where(col("p_brand") === "Brand#1")
    val pruned = t.lineitem
      .join(broadcast(brandParts.select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
    val partAvg = pruned
      .groupBy(col("l_partkey").as("pk"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
    pruned
      .join(partAvg, col("l_partkey") === col("pk"))
      .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n"))
  }

  val smallQtyRevenueSql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      | COUNT(*) AS n
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
      |JOIN (
      | SELECT l_partkey AS pk,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      | FROM lineitem GROUP BY l_partkey
      |) ON l_partkey = pk
      |WHERE l_quantity < 0.2 * avg_qty""".stripMargin

  /** Q18-style large-volume orders: IN-subquery over a HAVING aggregate,
    * then joined back for the customer report.
    */
  def largeOrders(t: Tables): DataFrame = {
    val big = t.lineitem
      .groupBy("l_orderkey")
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .where(col("sum_qty") > 150)
    t.orders
      .join(big, col("o_orderkey") === big("l_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val largeOrdersSql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
      |FROM orders
      |JOIN (
      | SELECT l_orderkey AS big_okey,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      | FROM lineitem GROUP BY l_orderkey
      | HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 150
      |) ON o_orderkey = big_okey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** Q19-style disjunctive predicates: three OR'ed brand/size/quantity
    * bands — exercises OR pushdown and predicate simplification.
    */
  def disjunctiveRevenue(t: Tables): DataFrame =
    t.lineitem
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 40)))
      .agg(revenue.as("revenue"), count(lit(1)).as("n"))

  val disjunctiveRevenueSql: String =
    """SELECT
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey AND (
      |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
      |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40))""".stripMargin
}
