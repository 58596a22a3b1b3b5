package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series conditioning operators: dense date spines, gap filling by
  * forward fill, and value binning — the reshaping steps between raw
  * event logs and model-ready series.
  */
object TimeSeries {

  /** Daily activity per user over a fixed January window, with a dense
    * date spine (`sequence()` per user — distributed, no driver loop)
    * and missing days forward-filled from the last active day.
    */
  def forwardFill(t: Tables): DataFrame = {
    val daily = t.events
      .where(col("user_id") < 10)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(sum(dec(col("value"))).cast("double").as("day_value"))
    val spine = t.events
      .select(col("user_id")).where(col("user_id") < 10).distinct()
      .withColumn("d",
        explode(expr("sequence(DATE '2024-01-01', DATE '2024-01-30', interval 1 day)")))
    val w = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(daily, Seq("user_id", "d"), "left")
      .withColumn("filled_value", last(col("day_value"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("day_value").isNull)
      .orderBy("user_id", "d")
  }

  val forwardFillSql: String =
    """SELECT user_id, d, day_value,
      | LAST_VALUE(day_value IGNORE NULLS) OVER (
      |   PARTITION BY user_id ORDER BY d
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
      | day_value IS NULL AS is_gap
      |FROM (
      | SELECT s.user_id, s.d, v.day_value
      | FROM (
      |  SELECT user_id, unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
      |                                         INTERVAL 1 DAY))::DATE AS d
      |  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 10)) s
      | LEFT JOIN (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
      |   CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS day_value
      |  FROM events WHERE user_id < 10 GROUP BY 1, 2) v
      | ON s.user_id = v.user_id AND s.d = v.d)
      |ORDER BY user_id, d""".stripMargin

  /** Equi-width histogram of order totals: bin index from closed-form
    * double arithmetic (identical expression tree both engines).
    */
  def histogram(t: Tables): DataFrame =
    t.orders
      .withColumn("bucket",
        least(lit(9), floor((col("o_totalprice") - 0.0) / 60000.0)).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy("bucket")

  val histogramSql: String =
    """SELECT CAST(least(9, floor((o_totalprice - 0.0) / 60000.0)) AS INT) AS bucket,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin
  /** Semi-additive month-end balances: per-part daily net movement →
    * decimal-exact running balance → the balance on the LAST movement day
    * of each month (balances sum over parts but NOT over time — the
    * period-END value is the right monthly rollup, the classic
    * inventory/account-balance semantics). Both windows are partitioned
    * by part — no global window, scale-safe at any part count.
    */
  def semiAdditive(t: Tables): DataFrame = {
    val daily = t.lineitem
      .where(col("l_shipdate").between(
        lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
      .groupBy(col("l_partkey"), to_date(col("l_shipdate")).as("d"))
      .agg(sum(dec(col("l_quantity"))).as("net"))
    val wBal = Window.partitionBy("l_partkey").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMonth = Window.partitionBy(col("l_partkey"), date_trunc("month", col("d")))
      .orderBy(col("d").desc)
    daily
      .withColumn("balance", sum(col("net")).over(wBal))
      .withColumn("rk", row_number().over(wMonth))
      .where(col("rk") === 1)
      .select(col("l_partkey"), date_trunc("month", col("d")).as("month"),
        col("balance").cast("double").as("month_end_balance"))
      .orderBy("l_partkey", "month")
  }

  val semiAdditiveSql: String =
    """WITH daily AS (
      | SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
      |  SUM(CAST(l_quantity AS DECIMAL(12,2))) AS net
      | FROM lineitem
      | WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                      AND TIMESTAMP '1997-12-31 00:00:00'
      | GROUP BY l_partkey, CAST(l_shipdate AS DATE)),
      |bal AS (
      | SELECT l_partkey, d,
      |  SUM(net) OVER (PARTITION BY l_partkey ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS balance,
      |  ROW_NUMBER() OVER (PARTITION BY l_partkey, date_trunc('month', d)
      |    ORDER BY d DESC) AS rk
      | FROM daily)
      |SELECT l_partkey, CAST(date_trunc('month', d) AS TIMESTAMP) AS month,
      | CAST(balance AS DOUBLE) AS month_end_balance
      |FROM bal WHERE rk = 1
      |ORDER BY l_partkey, month""".stripMargin
  /** Time-WEIGHTED average value per user over an irregular event
    * timeline: each value is weighted by the seconds until the user's
    * next event (classic sensor/price TWA — a plain AVG over-weights
    * bursts). One lead() window partitioned by user + one aggregation;
    * products accumulate in DECIMAL so the result is order-independent
    * and engine-portable; zero-total-duration users are excluded (a
    * double division by zero is engine-defined).
    */
  def timeWeightedAvg(t: Tables): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t.events
      .select(col("user_id"), col("value"),
        (unix_timestamp(lead(col("ts"), 1).over(w)) -
          unix_timestamp(col("ts"))).as("dur"))
      .where(col("dur").isNotNull)
      .groupBy("user_id")
      .agg(
        sum(dec(col("value")) * col("dur").cast(DecimalType(10, 0))).as("wsum"),
        sum(col("dur")).as("total_dur"),
        count(lit(1)).as("n_intervals"))
      .where(col("total_dur") > 0)
      .select(col("user_id"),
        // exact while the scaled weighted sum stays under 2⁵³ (≈9·10¹³
        // cent-seconds per user): both engines then convert the decimal
        // sum to the same double and divide by the same integer. A
        // DECIMAL(24,12) re-rounding would NOT help here — these sums
        // are terminating decimals that land on exact half-way points,
        // where the engines' double→decimal conversions disagree.
        (col("wsum").cast("double") / col("total_dur")).as("twa"),
        col("total_dur"), col("n_intervals"))
      .orderBy("user_id")
  }

  val timeWeightedAvgSql: String =
    """WITH p AS (
      | SELECT user_id, value,
      |  date_diff('second', CAST(ts AS TIMESTAMP),
      |    LEAD(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS dur
      | FROM events)
      |SELECT user_id,
      | CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(dur AS DECIMAL(10,0))) AS DOUBLE)
      |   / CAST(SUM(dur) AS BIGINT) AS twa,
      | CAST(SUM(dur) AS BIGINT) AS total_dur,
      | CAST(COUNT(*) AS BIGINT) AS n_intervals
      |FROM p
      |WHERE dur IS NOT NULL
      |GROUP BY user_id
      |HAVING SUM(dur) > 0
      |ORDER BY user_id""".stripMargin

  /** 2-D histogram (heatmap feed): fixed-width quantity band (five
    * 10-unit buckets, capped) x discount-band cell counts with
    * exact-decimal revenue per cell. Bucket keys are exact integer
    * arithmetic on the decimal domain values, so cells are
    * engine-portable; one aggregation pass, bounded output (cells, not
    * rows), the standard dashboard heatmap shape.
    */
  def histogram2d(t: Tables): DataFrame = {
    // bucket on integer CENTS with floor division (Spark's decimal→long
    // cast truncates where DuckDB's rounds — cents avoid the cast): the
    // double ratios below are exact or safely floor-truncating for the
    // bounded cent values, identical in both engines
    val qc = (dec(col("l_quantity")) * 100).cast("long")
    val dc = (dec(col("l_discount")) * 100).cast("long")
    t.lineitem
      .withColumn("q_bucket", least(lit(4L), (qc / lit(1000)).cast("long")).cast("int"))
      .withColumn("d_bucket", (dc / lit(2)).cast("long").cast("int"))
      .groupBy("q_bucket", "d_bucket")
      .agg(count(lit(1)).as("n"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy("q_bucket", "d_bucket")
  }

  val histogram2dSql: String =
    """SELECT
      | CAST(LEAST(4, CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) // 1000) AS INT) AS q_bucket,
      | CAST(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) // 2 AS INT) AS d_bucket,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |   CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |GROUP BY 1, 2
      |ORDER BY q_bucket, d_bucket""".stripMargin
}
