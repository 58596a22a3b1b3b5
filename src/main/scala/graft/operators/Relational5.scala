package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fifth tranche: the last classic TPC-H shapes expressible on this
  * schema — top-by-scalar-max (Q15), scalar-subquery-gated anti-join
  * aggregation (Q22), multi-join derived-measure profit (Q9 shape), late
  * shipment conditional counts (Q12 shape), supplier-part distinct
  * counts with NOT IN exclusion (Q16 shape, lineitem's distinct
  * (part, supplier) pairs standing in for partsupp), and the
  * qty-threshold semi-join chain (Q20 shape, "dominant supplier of a
  * part's yearly volume" standing in for the availqty threshold),
  * min-cost supplier per part (Q2 shape, the observed minimum line
  * price standing in for ps_supplycost), and value-concentration
  * HAVING-over-scalar-share (Q11 shape) — completing adaptations of
  * ALL 22 TPC-H query shapes on this schema. (Q12's shipmode/
  * commitdate and Q22's phone column are adapted to the columns that
  * exist, with the query SHAPE preserved.) Plus the gaps-and-islands
  * streak pattern.
  */
object Relational5 {

  private def revenueDec = sum(discPrice(col("l_extendedprice"), col("l_discount")))

  /** Q15: supplier(s) with the maximum quarterly revenue. The per-supplier
    * aggregate is computed once; the scalar max joins back by decimal
    * EQUALITY (exact decimal sums make that portable), so ties all
    * surface. At scale: one partial-agg shuffle + a broadcast of the
    * 1-row max + a broadcast dim join.
    */
  def topSupplier(t: Tables): DataFrame = {
    val rev = t.lineitem
      .where(col("l_shipdate").between(
        lit("1996-01-01").cast("timestamp"), lit("1996-03-31").cast("timestamp")))
      .groupBy(col("l_suppkey"))
      .agg(revenueDec.as("rev_dec"))
    val mx = rev.agg(max(col("rev_dec")).as("mx"))
    rev.join(broadcast(mx), col("rev_dec") === col("mx"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val topSupplierSql: String =
    """WITH rev AS (
      | SELECT l_suppkey,
      |  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) AS rev_dec
      | FROM lineitem
      | WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                      AND TIMESTAMP '1996-03-31 00:00:00'
      | GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Q22: idle high-balance customers — balance above the positive-balance
    * average (scalar subquery, exact decimal sum ÷ count so the threshold
    * is the same double in any engine) and no orders (anti-join), grouped
    * by segment. At scale: 1-row broadcast gate + broadcast-able anti
    * join + one aggregation.
    */
  def idleCustomers(t: Tables): DataFrame = {
    val avgBal = t.customer
      .where(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    t.customer
      .crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  val idleCustomersSql: String =
    """SELECT c_mktsegment, COUNT(*) AS numcust,
      | CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      |  FROM customer WHERE c_acctbal > 0)
      | AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Q9 shape: profit by supplier nation × order year over a part-name
    * filter, with the part's discounted retail price as the cost proxy
    * (this dataset has no partsupp.ps_supplycost). Derived measure stays
    * decimal end-to-end. At scale: part/supplier/nation broadcast; the
    * lineitem⋈orders fact join shuffles on orderkey.
    */
  def profitByNation(t: Tables): DataFrame = {
    val cost = dec(col("p_retailprice")) * lit(BigDecimal("0.60")).cast(DecimalType(4, 2)) *
      dec(col("l_quantity"))
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.part.where(col("p_name").contains("red"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")) - cost)
        .cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val profitByNationSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      | CAST(SUM(
      |   CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))
      |   - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.60 AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(12,2))
      | ) AS DOUBLE) AS profit
      |FROM lineitem, orders, part, supplier, nation
      |WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      | AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      | AND p_name LIKE '%red%'
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin

  /** Q12 shape: late-shipment priority counts per line status (this
    * dataset has no shipmode/commitdate; "late" = shipped more than 60
    * days after the order date, the status column stands in for the ship
    * mode). One fact-fact join + conditional counts.
    */
  def latePriorityLines(t: Tables): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS") &&
        col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val latePriorityLinesSql: String =
    """SELECT l_linestatus,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      | AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                    AND TIMESTAMP '1996-12-31 00:00:00'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** Gaps-and-islands: longest consecutive-day activity streak per user.
    * The classic (epoch_day − row_number) grouping trick — two window-free
    * aggregations and one per-user window, all partitioned by user. Output
    * per user: longest streak, number of streaks, total active days.
    */
  def activityStreaks(t: Tables): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("d")
    val days = t.events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    days
      .withColumn("grp",
        datediff(col("d"), lit("1970-01-01").cast("date")) - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
      .orderBy("user_id")
  }

  val activityStreaksSql: String =
    """WITH days AS (
      | SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
      |r AS (
      | SELECT user_id, d,
      |  datediff('day', DATE '1970-01-01', d)
      |    - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      | FROM days),
      |s AS (SELECT user_id, grp, COUNT(*) AS len FROM r GROUP BY user_id, grp)
      |SELECT user_id, MAX(len) AS longest_streak,
      | CAST(COUNT(*) AS BIGINT) AS n_streaks,
      | CAST(SUM(len) AS BIGINT) AS active_days
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Q21 shape: suppliers who kept finished multi-supplier orders
    * waiting — late lines (the q12 60-day proxy) on 'F' orders where
    * EVERY other supplier on the order delivered on time. The classic
    * exists/not-exists pair is re-expressed as ONE per-order aggregate
    * (distinct suppliers, distinct LATE suppliers) joined back to the
    * late lines: `late_supps = 1` ⟺ "no OTHER supplier was late" (the
    * line's own supplier is late by selection), `n_supps ≥ 2` ⟺ "another
    * supplier exists". Two shuffles on the order key — AQE-coalesced —
    * instead of two correlated fact-table subqueries; dims broadcast.
    * The oracle keeps the textbook EXISTS/NOT EXISTS form, so the
    * rewrite itself is what's being verified.
    */
  def waitingSuppliers(t: Tables): DataFrame = {
    val ordF = t.orders.where(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val li = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(ordF, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    // pre-aggregate to one row per (order, supplier): the two distinct
    // counts become plain counts over this frame (no Expand duplication
    // of the fact rows), the second aggregation and the join-back reuse
    // the same order-key partitioning, and the late-line count rides
    // along as a sum instead of re-joining the raw lines
    val perSupp = li.groupBy("l_orderkey", "l_suppkey")
      .agg(sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
    val perOrder = perSupp.groupBy("l_orderkey").agg(
      count(lit(1)).as("n_supps"),
      sum(when(col("n_late") > 0, 1L).otherwise(0L)).as("late_supps"))
    perSupp.where(col("n_late") > 0)
      .join(perOrder, Seq("l_orderkey"))
      .where(col("n_supps") >= 2 && col("late_supps") === 1)
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("s_name", "n_name")
      .agg(sum(col("n_late")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** Q16 shape: how many qualified suppliers can supply each surviving
    * (brand, type, size) bucket. lineitem's distinct (part, supplier)
    * pairs stand in for partsupp; the "complaints" NOT IN exclusion is
    * adapted to suppliers in arrears (negative balance) — same
    * decorrelated anti-join shape. At scale: the part filter broadcasts
    * into the fact scan, the exclusion list broadcasts as an anti join
    * (suppliers are dimension-sized), and the per-bucket distinct count
    * is ONE aggregation — the oracle's distinct-pair CTE is subsumed by
    * countDistinct, so no separate pair-dedup shuffle is paid.
    */
  def partSupplierCounts(t: Tables): DataFrame = {
    val sizes = Seq(1, 4, 7, 10, 13, 16, 19, 22)
    val parts = t.part.where(col("p_brand") =!= "Brand#3" &&
      !col("p_type").startsWith("PROMO") && col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSupp = t.supplier.where(col("s_acctbal") < 0).select("s_suppkey")
    t.lineitem.select("l_partkey", "l_suppkey")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val partSupplierCountsSql: String =
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_brand, p_type, p_size,
      | CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM ps JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#3' AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1,4,7,10,13,16,19,22)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q2 shape: the supplier(s) offering each filtered part at the
    * minimum observed cost among one region's suppliers — the classic
    * argmin-per-group with a correlated min subquery, decorrelated into
    * an aggregate joined back by EXACT DECIMAL EQUALITY (ties all
    * surface, as in Q2 itself). The observed minimum line price stands
    * in for ps_supplycost. At scale: dims broadcast into the fact scan
    * (the part band prunes before aggregation — per-part minima are
    * unaffected by dropping other parts), offers aggregate once on
    * (part, supplier), and the per-part min joins back co-partitioned
    * on the part key.
    */
  def minCostSupplier(t: Tables): DataFrame = {
    val regionSupp = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "n_name")
    val bandParts = t.part
      .where(col("p_size").between(10, 20) && col("p_type") === "STANDARD")
      .select("p_partkey")
    val offers = t.lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(bandParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(regionSupp.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(dec(col("l_extendedprice"))).as("cost"))
    val mins = offers.groupBy("l_partkey")
      .agg(min(col("cost")).as("min_cost"))
      .withColumnRenamed("l_partkey", "m_partkey")
    offers
      .join(mins, col("l_partkey") === col("m_partkey") &&
        col("cost") === col("min_cost"))
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_name"), col("n_name"),
        col("cost").cast("double").as("cost"))
      .orderBy("cost", "p_partkey", "s_name")
  }

  val minCostSupplierSql: String =
    """WITH offers AS (
      | SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
      | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |   JOIN nation ON s_nationkey = n_nationkey
      |   JOIN region ON n_regionkey = r_regionkey
      | WHERE r_name = 'ASIA'
      | GROUP BY 1, 2),
      |mins AS (SELECT l_partkey, MIN(cost) AS min_cost FROM offers GROUP BY 1)
      |SELECT p_partkey, s_name, n_name, CAST(o.cost AS DOUBLE) AS cost
      |FROM offers o JOIN mins m ON o.l_partkey = m.l_partkey AND o.cost = m.min_cost
      |  JOIN part ON p_partkey = o.l_partkey
      |  JOIN supplier ON s_suppkey = o.l_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
      |ORDER BY cost, p_partkey, s_name""".stripMargin

  /** Q11 shape: value concentration — parts whose revenue (through one
    * nation group's suppliers) exceeds a multiple of the average part's,
    * i.e. TPC-H's HAVING-over-scalar-share with the fraction made
    * SCALE-INVARIANT (Q11's fixed 0.0001 fraction empties or floods the
    * report as the corpus grows; k× the mean does not). Decorrelated:
    * the threshold is a broadcast 1-row aggregate over the same frame
    * (exact decimal sum ÷ count, the q22 recipe). At scale: one fact
    * aggregation on the part key + a 1-row broadcast gate.
    */
  def importantParts(t: Tables): DataFrame = {
    val nations = Seq(0, 5, 10, 15, 20).map(i => s"NATION_$i")
    val supp = t.supplier
      .join(broadcast(t.nation.where(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val value = t.lineitem
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(revenueDec.as("value"))
    val thr = value.agg(
      (sum(col("value")).cast("double") / count(lit(1))).as("avg_val"))
    value.crossJoin(broadcast(thr))
      .where(col("value").cast("double") > lit(2.0) * col("avg_val"))
      .select(col("l_partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  val importantPartsSql: String =
    """WITH val AS (
      | SELECT l_partkey,
      |  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |      CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) AS value
      | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |   JOIN nation ON s_nationkey = n_nationkey
      | WHERE n_name IN ('NATION_0','NATION_5','NATION_10','NATION_15','NATION_20')
      | GROUP BY 1)
      |SELECT l_partkey, CAST(value AS DOUBLE) AS value
      |FROM val
      |WHERE CAST(value AS DOUBLE) >
      |  2.0 * (SELECT CAST(SUM(value) AS DOUBLE) / COUNT(*) FROM val)
      |ORDER BY value DESC, l_partkey""".stripMargin

  /** Q20 shape: suppliers (from a nation group) who DOMINATED some
    * filtered part's 1996 volume — shipped more than half that part's
    * total for the year. The availqty > ½·Σqty correlated subquery
    * becomes a decorrelated aggregate-join chain: per-(part, supplier)
    * exact decimal qty, per-part total reusing that aggregate, a double
    * threshold compare (both engines divide the same exact decimals),
    * then a semi join into the supplier dimension. At scale: the part
    * filter prunes the fact scan via broadcast, both aggregations
    * shuffle on the part key, and the final semi join broadcasts the
    * small qualified-supplier set.
    */
  def dominantSuppliers(t: Tables): DataFrame = {
    val nations = (1 to 5).map(i => s"NATION_$i")
    val qty = t.lineitem
      .where(year(col("l_shipdate")) === 1996)
      .join(broadcast(t.part.where(col("p_name").startsWith("small"))
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(dec(col("l_quantity"))).as("qty"))
    val tot = qty.groupBy("l_partkey").agg(sum(col("qty")).as("tot"))
    val sel = qty.join(tot, Seq("l_partkey"))
      .where(col("qty").cast("double") > lit(0.5) * col("tot").cast("double"))
      .select("l_suppkey").distinct()
    t.supplier
      .join(broadcast(t.nation.where(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(sel), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_name", "s_suppkey")
  }

  val dominantSuppliersSql: String =
    """WITH q AS (
      | SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      | FROM lineitem JOIN part ON p_partkey = l_partkey
      | WHERE year(l_shipdate) = 1996 AND p_name LIKE 'small%'
      | GROUP BY 1, 2),
      |t AS (SELECT l_partkey, SUM(qty) AS tot FROM q GROUP BY 1),
      |sel AS (
      | SELECT DISTINCT l_suppkey FROM q JOIN t USING (l_partkey)
      | WHERE CAST(qty AS DOUBLE) > 0.5 * CAST(tot AS DOUBLE))
      |SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
      |  AND s_suppkey IN (SELECT l_suppkey FROM sel)
      |ORDER BY s_name, s_suppkey""".stripMargin

  val waitingSuppliersSql: String =
    """SELECT s_name, n_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey
      | AND o_orderkey = l1.l_orderkey
      | AND o_orderstatus = 'F'
      | AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      | AND EXISTS (
      |   SELECT 1 FROM lineitem l2
      |   WHERE l2.l_orderkey = l1.l_orderkey
      |     AND l2.l_suppkey <> l1.l_suppkey)
      | AND NOT EXISTS (
      |   SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
      |   WHERE l3.l_orderkey = l1.l_orderkey
      |     AND l3.l_suppkey <> l1.l_suppkey
      |     AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      | AND s_nationkey = n_nationkey
      |GROUP BY s_name, n_name
      |ORDER BY numwait DESC, s_name""".stripMargin
}
