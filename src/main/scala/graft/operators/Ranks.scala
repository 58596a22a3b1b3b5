package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global ranking — the scale-safe replacement for an
  * unpartitioned `row_number()/ntile()` window (which moves ALL rows to
  * one partition).
  *
  * Shape: range-repartition on the sort key so partition i holds keys ≤
  * partition i+1, rank locally per partition (a window PARTITIONED BY the
  * physical partition id — no data movement), then add per-partition
  * offsets (one tiny aggregation collected to the driver: #partitions
  * rows, bounded model state). Exactly the classic two-phase distributed
  * sort-rank; every step is a DataFrame op.
  *
  * Requires a fully tie-broken (unique) sort key, which is also what
  * makes the rank deterministic and engine-portable.
  */
object Ranks {

  /** Adds `rankCol` = 1-based global rank under `sortCols`; returns the
    * ranked frame and the total row count (needed for exact NTILE).
    */
  def withGlobalRank(df: DataFrame, rankCol: String,
                     sortCols: Column*): (DataFrame, Long) = {
    // no sortWithinPartitions here: the local row_number window re-sorts
    // after its own _pid exchange anyway — a pre-sort would be dead work
    val sorted = df
      .repartitionByRange(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
    val local = sorted.withColumn("_lrn",
      row_number().over(Window.partitionBy("_pid").orderBy(sortCols: _*)))
      .persist()
    // per-partition counts: #shuffle-partitions rows — bounded driver state
    val counts = local.groupBy("_pid").agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    var acc = 0L
    val offsets = counts.map { case (pid, n) => val o = (pid, acc); acc += n; o }
    val spark = df.sparkSession
    import spark.implicits._
    // offsets rejoin as a broadcast (one row per partition — never a
    // driver-sized expression ladder)
    val offsetDf = offsets.toSeq.toDF("_pid", "_offset")
    val ranked = local
      .join(broadcast(offsetDf), Seq("_pid"))
      .withColumn(rankCol, col("_offset") + col("_lrn"))
      .drop("_pid", "_lrn", "_offset")
    (ranked, total)
  }

  /** Exact SQL NTILE(k) from a 1-based global rank over `total` rows:
    * with q = total div k and r = total mod k, the FIRST r buckets get
    * q+1 rows and the rest q — so ranks ≤ r·(q+1) land in bucket
    * ⌈rank/(q+1)⌉ and later ranks continue in q-sized buckets. The divs
    * run as floored double division — exact for any realistic count
    * (quotients stay under 2⁵³ and a true non-integer quotient is ≥ 1/q
    * below the next integer).
    */
  def ntileOf(k: Int, rank: Column, total: Long): Column = {
    val q = total / k
    val r = total % k
    val cut = r * (q + 1)
    when(rank <= cut,
      floor((rank - lit(1)).cast("double") / lit((q + 1).toDouble)).cast("int") + 1)
      .otherwise(
        floor((rank - lit(cut) - lit(1)).cast("double") / lit(q.toDouble)).cast("int") +
          r.toInt + 1)
  }
}
