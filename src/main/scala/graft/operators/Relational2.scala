package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Second tranche of relational operators: multi-dimensional aggregates,
  * set operations, scalar string/date function coverage, and a
  * skew-resistant salted aggregation.
  */
object Relational2 {

  /** CUBE over two dimensions (all 4 grouping sets). */
  def cubeTotals(t: Tables): DataFrame =
    t.orders
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val cubeTotalsSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** INTERSECT: nations having both customers and suppliers with negative
    * account balances.
    */
  def intersectKeys(t: Tables): DataFrame =
    t.customer.where(col("c_acctbal") < 0).select(col("c_nationkey").as("nationkey"))
      .intersect(
        t.supplier.where(col("s_acctbal") < 0).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  val intersectKeysSql: String =
    """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 0
      |ORDER BY nationkey""".stripMargin

  /** EXCEPT: nations with customers but no suppliers. */
  def exceptKeys(t: Tables): DataFrame =
    t.customer.select(col("c_nationkey").as("nationkey"))
      .except(t.supplier.select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  val exceptKeysSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** Scalar string-function coverage: upper/lower/substr/trim/replace/
    * length/concat/split — the transform layer's bread and butter.
    */
  def stringFuncs(t: Tables): DataFrame =
    t.part.select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        lower(col("p_name")).as("name_lower"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        size(split(col("p_name"), " ")).as("name_words"))
      .orderBy("p_partkey")

  val stringFuncsSql: String =
    """SELECT p_partkey,
      | upper(p_brand) AS brand_upper,
      | lower(p_name) AS name_lower,
      | substring(p_name, 1, 5) AS name_prefix,
      | length(p_name) AS name_len,
      | regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
      | p_brand || '|' || p_type AS brand_type,
      | len(string_split(p_name, ' ')) AS name_words
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Scalar date/time-function coverage: extract/trunc/diff/add. */
  def dateFuncs(t: Tables): DataFrame =
    t.orders.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        to_date(col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due_date"),
        datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate"))).as("age_days"))
      .orderBy("o_orderkey")

  val dateFuncsSql: String =
    """SELECT o_orderkey,
      | CAST(year(o_orderdate) AS INT) AS y,
      | CAST(month(o_orderdate) AS INT) AS m,
      | CAST(day(o_orderdate) AS INT) AS d,
      | CAST(quarter(o_orderdate) AS INT) AS q,
      | date_trunc('month', o_orderdate) AS month_start,
      | CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
      | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS age_days
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Skew-resistant aggregation: 100k events collapse onto 5 event types,
    * so a naive groupBy funnels everything through 5 reducers. Salting
    * fans each hot key across 16 partial aggregates, then a second cheap
    * aggregation merges the partials. Result is identical to the naive
    * plan (oracle = plain GROUP BY) — only the shuffle shape changes.
    */
  def saltedSkewAgg(t: Tables): DataFrame =
    t.events
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy("event_type", "salt")
      .agg(
        count(lit(1)).as("pn"),
        sum(dec(col("value"))).as("pv"))
      .groupBy("event_type")
      .agg(
        sum(col("pn")).as("n"),
        sum(col("pv")).cast("double").as("total_value"))
      .orderBy("event_type")

  val saltedSkewAggSql: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Global top-N without a global sort: TakeOrderedAndProject reduces
    * per-partition top-Ns.
    */
  def globalTopN(t: Tables): DataFrame =
    t.orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  val globalTopNSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 25""".stripMargin

  /** Sliding (hopping) event-time windows: 1-hour windows every 30
    * minutes — each event lands in exactly two windows. Batch twin of the
    * streaming hop aggregation; Spark's `window()` explodes the hops,
    * the oracle unnests the same two bucket starts.
    */
  def slidingAgg(t: Tables): DataFrame =
    t.events
      .groupBy(
        window(col("ts"), "1 hour", "30 minutes").getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy("win_start", "event_type")

  val slidingAggSql: String =
    """SELECT win_start, event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM (
      | SELECT event_type, value,
      |  unnest([time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
      |          time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '30 minutes'])
      |    AS win_start
      | FROM events)
      |GROUP BY win_start, event_type
      |ORDER BY win_start, event_type""".stripMargin

  /** Conditional expressions: CASE ladders + NULL-aware arithmetic. */
  def caseWhen(t: Tables): DataFrame =
    t.customer.select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "overdrawn")
          .when(col("c_acctbal") < 1000, "low")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("balance_band"),
        when(col("c_acctbal") >= 0, col("c_acctbal")).as("positive_bal"))
      .orderBy("c_custkey")

  val caseWhenSql: String =
    """SELECT c_custkey,
      | CASE WHEN c_acctbal < 0 THEN 'overdrawn'
      |      WHEN c_acctbal < 1000 THEN 'low'
      |      WHEN c_acctbal < 5000 THEN 'mid'
      |      ELSE 'high' END AS balance_band,
      | CASE WHEN c_acctbal >= 0 THEN c_acctbal END AS positive_bal
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** GROUPING SETS — the general multi-aggregation form that ROLLUP/CUBE
    * specialize: per (priority, status), per status alone, and the grand
    * total, in ONE pass (Spark expands the sets in a single Expand +
    * aggregate, not three scans).
    */
  def groupingSetsTotals(t: Tables): DataFrame =
    t.orders
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  val groupingSetsTotalsSql: String =
    """SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderstatus), ())
      |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin
}
