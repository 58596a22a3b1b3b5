package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Load layer: partitioned, ordered columnar sinks — the Spark-native
  * re-expression of the reference's ClickHouse MergeTree DDL
  * (loaders.py:685-716: PARTITION BY toYYYYMM(ts), ORDER BY (ts, ...)).
  *
  * parquet + hive-style month partitions gives the same pruning the
  * MergeTree partition key gives ClickHouse; sortWithinPartitions gives
  * the same locality the ORDER BY clause gives (row-group min/max stats
  * make time-range scans skip).
  */
object Sinks {

  /** Month-partitioned, time-ordered fact write (fact_sales twin). */
  def writeMonthPartitioned(df: DataFrame, tsCol: String, path: String,
      orderCols: Seq[String]): Unit =
    df.withColumn("ym", date_format(col(tsCol), "yyyyMM"))
      .repartition(col("ym"))
      .sortWithinPartitions(orderCols.map(col): _*)
      .write
      .mode("overwrite")
      .partitionBy("ym")
      .parquet(path)

  /** Bucketed table write: pre-shuffles once on the bucket key so that
    * later joins/aggregations on that key are Exchange-free (the Spark
    * analog of co-located MergeTree tables). Requires `saveAsTable`
    * (bucket metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Upsert (merge) into a month-partitioned parquet fact table:
    * union the update batch with the existing rows of ONLY the touched
    * partitions, compact to the latest version per key, and rewrite just
    * those partitions (dynamic partition overwrite). At 100 TB the cost
    * scales with the touched months, not the table.
    */
  def upsertByKey(spark: org.apache.spark.sql.SparkSession, path: String,
      updates: DataFrame, keyCol: String, tsCol: String): Unit = {
    val withYm = updates.withColumn("ym", date_format(col(tsCol), "yyyyMM"))
    val touched = withYm.select("ym").distinct()
      .collect().map(_.getString(0)).toSeq
    val existing =
      try spark.read.parquet(path).where(col("ym").isin(touched: _*))
      catch { case _: Throwable => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withYm.schema) }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol).desc)
    val merged = existing.unionByName(withYm)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy("ym").parquet(path)
    finally prev.foreach(spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
  }

  /** Chunked plain write (the reference's chunked insert, loaders.py:775
    * — in Spark the parallel write IS the chunking; `maxRecordsPerFile`
    * bounds file sizes for downstream consumers).
    */
  def writeChunked(df: DataFrame, path: String, maxRecordsPerFile: Int): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .parquet(path)
}
