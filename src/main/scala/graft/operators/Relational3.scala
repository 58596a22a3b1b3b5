package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third tranche: ordered-argument aggregates, nested array results,
  * regex extraction, RANGE window frames.
  */
object Relational3 {

  /** min_by / max_by: which order carries the min/max price per status.
    * Ties broken deterministically by taking the extreme orderkey via a
    * struct ordering (DuckDB arg_min/arg_max on a struct behaves the
    * same: lexicographic on (price, orderkey)).
    */
  def argExtremes(t: Tables): DataFrame =
    t.orders
      .groupBy("o_orderstatus")
      .agg(
        min(struct(col("o_totalprice"), col("o_orderkey"))).getField("o_orderkey")
          .as("cheapest_order"),
        max(struct(col("o_totalprice"), col("o_orderkey"))).getField("o_orderkey")
          .as("priciest_order"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("o_orderstatus")

  val argExtremesSql: String =
    """SELECT o_orderstatus,
      | (MIN(struct_pack(p := o_totalprice, k := o_orderkey))).k AS cheapest_order,
      | (MAX(struct_pack(p := o_totalprice, k := o_orderkey))).k AS priciest_order,
      | MIN(o_totalprice) AS min_price,
      | MAX(o_totalprice) AS max_price
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Nested array results: per-nation sorted list of top customer keys.
    * collect_list is partition-order dependent, so the contract is a
    * SORTED array — order-independent and engine-portable.
    */
  def arrayAgg(t: Tables): DataFrame =
    t.customer
      .where(col("c_acctbal") > 9900)
      .groupBy("c_nationkey")
      .agg(array_sort(collect_list(col("c_custkey"))).as("rich_customers"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey")

  val arrayAggSql: String =
    """SELECT c_nationkey, list_sort(list(c_custkey)) AS rich_customers, COUNT(*) AS n
      |FROM customer
      |WHERE c_acctbal > 9900
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** Regex extraction/matching over text columns. */
  def regexExtract(t: Tables): DataFrame =
    t.documents.select(
        col("doc_id"),
        regexp_extract(col("source"), "src(\\d+)", 1).cast("int").as("src_num"),
        col("text").rlike("spark .* table").as("mentions_spark_table"),
        size(expr("regexp_extract_all(text, 'query', 0)")).as("query_mentions"))
      .orderBy("doc_id")

  val regexExtractSql: String =
    """SELECT doc_id,
      | CAST(regexp_extract(source, 'src(\d+)', 1) AS INT) AS src_num,
      | regexp_matches(text, 'spark .* table') AS mentions_spark_table,
      | len(regexp_extract_all(text, 'query', 0)) AS query_mentions
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** RANGE window frame: 7-day trailing revenue per customer, frame
    * defined on epoch seconds so both engines share numeric range
    * semantics exactly.
    */
  def rangeFrame(t: Tables): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("epoch_s"))
      .rangeBetween(-7L * 86400, 0)
    t.orders
      .withColumn("epoch_s", col("o_orderdate").cast("timestamp").cast("long"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("trailing_7d"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Ranking-function coverage: rank / dense_rank / percent_rank /
    * cume_dist / ntile in one window.
    */
  def rankFuncs(t: Tables): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    t.customer.select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).as("quartile"))
      .orderBy("c_mktsegment", "rnk")
  }

  val rankFuncsSql: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      | CAST(RANK() OVER w AS INT) AS rnk,
      | CAST(DENSE_RANK() OVER w AS INT) AS drnk,
      | PERCENT_RANK() OVER w AS prnk,
      | CUME_DIST() OVER w AS cdist,
      | CAST(NTILE(4) OVER w AS INT) AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_mktsegment, rnk""".stripMargin

  /** Sketch aggregates for the 100 TB path: HyperLogLog distinct counts
    * and quantile sketches — constant memory per group where the exact
    * versions need the full key set. Rows-only (sketch internals are
    * implementation-defined), sanity-bounded in specs.
    */
  def sketchAggs(t: Tables): DataFrame =
    t.orders
      .groupBy("o_orderpriority")
      .agg(
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"),
        countDistinct(col("o_custkey")).as("exact_customers"),
        expr("approx_percentile(o_totalprice, array(0.5, 0.9), 1000)").as("price_quantiles"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  val rangeFrameSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
      |   PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
      |   RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_7d
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin
}
