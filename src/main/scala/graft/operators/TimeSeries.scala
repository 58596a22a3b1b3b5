package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
