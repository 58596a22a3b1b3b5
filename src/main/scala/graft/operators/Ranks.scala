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
      .localCheckpoint(true)
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

  /** N independent global ranks in ONE range shuffle.
    *
    * Each metric is `(name, sortValue)` where `sortValue` is a
    * double-valued Column (pre-negate for descending order; ties are
    * broken by `keyCol` ascending, which must be unique per row). The
    * input is exploded to `(metric, value, key)` rows, range-partitioned
    * ONCE on `(metric, value, key)`, and locally ranked without any
    * further exchange: after `sortWithinPartitions` the local position is
    * `monotonically_increasing_id() - min(id in this (partition, metric)
    * run)` — ids are consecutive within a partition, so no `_pid` window
    * (which would re-shuffle) is needed. Per-(partition, metric) counts
    * and first-ids are one bounded collect (≤ partitions × metrics rows);
    * offsets rejoin as a broadcast.
    *
    * Compared to calling [[withGlobalRank]] per metric this runs one
    * range shuffle + one tiny aggregation instead of `metrics.size`
    * shuffle/collect rounds — the same latency argument as a two-level
    * prefix sum, applied across orderings.
    *
    * Returns one row per input row: `keyCol` plus an exact 1-based rank
    * column per metric, and the row count (shared by all metrics).
    */
  def withGlobalRanksFused(df: DataFrame, keyCol: String,
                           metrics: Seq[(String, Column)]): (DataFrame, Long) = {
    require(metrics.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    val entries = metrics.zipWithIndex.map { case ((_, v), i) =>
      // `+ 0.0` normalizes a negated zero: -0.0 and 0.0 must land in the
      // same range bucket AND compare equal, so ties fall to the key
      struct(lit(i).as("_m"), (v.cast("double") + lit(0.0)).as("_v"))
    }
    val tagged = df.select(col(keyCol).as("_key"), explode(array(entries: _*)).as("_e"))
      .select(col("_key"), col("_e._m").as("_m"), col("_e._v").as("_v"))
    val local = tagged
      .repartitionByRange(col("_m"), col("_v"), col("_key"))
      .sortWithinPartitions(col("_m"), col("_v"), col("_key"))
      .withColumn("_pid", spark_partition_id())
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint(true)
    // (partition, metric) → run length + first id: bounded driver state
    val stats = local.groupBy("_pid", "_m")
      .agg(count(lit(1)).as("_n"), min(col("_mid")).as("_first"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val total = stats.filter(_._2 == 0).map(_._3).sum
    val offsets = stats.groupBy(_._2).toSeq.flatMap { case (m, rows) =>
      var acc = 0L
      rows.sortBy(_._1).map { case (pid, _, n, first) =>
        val o = (pid, m, acc, first); acc += n; o
      }
    }
    val offsetDf = offsets.toDF("_pid", "_m", "_offset", "_first")
    val rankCols = metrics.zipWithIndex.map { case ((name, _), i) =>
      max(when(col("_m") === i, col("_rank"))).as(name)
    }
    val ranked = local
      .join(broadcast(offsetDf), Seq("_pid", "_m"))
      .select(col("_key"),
        col("_m"), (col("_offset") + col("_mid") - col("_first") + 1).as("_rank"))
      .groupBy("_key")
      .agg(rankCols.head, rankCols.tail: _*)
      .withColumnRenamed("_key", keyCol)
    (ranked, total)
  }

  /** Exact global PREFIX AGGREGATES (running sum / running min in sort
    * order) without an unpartitioned window — the scan twin of
    * [[withGlobalRank]] for cumulative-CDF / running-extremum shapes.
    *
    * Same two-level mechanics as the classic distributed scan —
    * range-repartition on the sort key, run the window locally
    * PARTITIONED BY the physical partition id, add each partition's
    * exclusive offset — with BOTH the local pass and the per-partition
    * totals reading ONE materialized RDD of the ranged frame: the
    * range bounds are sampled exactly once (at the .rdd construction)
    * and every consumer reads the same shuffle files with the same
    * partition indices, so row→_pid agreement is STRUCTURAL — it does
    * not depend on Spark's exchange-reuse rule matching the two
    * branches (a silent-corruption hazard if canonicalization ever
    * missed). The exclusive prefix across partitions is a bounded
    * self-join over ≤ shuffle-partitions total rows (the segTot-offsets
    * pattern) that AQE broadcasts back onto the data — no driver
    * collect, no localCheckpoint barrier, no multi-job cascade. r14
    * measured the 11 prefix-scan queries at sf0.1 dropping 13.2 →
    * 11.3 s median (12.1 → 10.4 s min-sum) versus the eager-pin +
    * driver-collect design this replaces.
    *
    * For `sum` the combine is `local + offset`; for `min` it is a
    * null-skipping `least(local, offset)` (Spark's `least` ignores
    * nulls, so the global first rows keep the exclusive-window NULL
    * contract).
    *
    * '''Call-site contract — pin expensive inputs.''' The `.rdd`
    * materialization below samples range bounds by EXECUTING `df` once
    * before the shuffle map executes it again: an unpinned upstream
    * runs twice. For cheap scans that double read is cheaper than the
    * localCheckpoint barrier this design replaced (measured net-faster
    * at sf0.1/sf1 across the 11 scan queries), but a caller whose
    * input is itself a heavy aggregation/join (mannWhitney, ksTest,
    * aucRoc, logRank pass full fact aggregations) should
    * `localCheckpoint(true)` that input BEFORE calling, as leveneBf
    * and pettitt already do — otherwise the r13 hazard (a 6× wall
    * regression from re-running an expensive upstream) silently
    * returns as upstream cost grows.
    *
    * `aggs` entries are `(outCol, valueCol, fn, inclusive)` with
    * `fn ∈ {sum, min}`; values are cast to long (all call sites carry
    * exact integer micros/counts). `inclusive=false` gives the
    * `ROWS UNBOUNDED PRECEDING TO 1 PRECEDING` frame (NULL on each
    * partition-0 first row, exactly like the single-partition window it
    * replaces). Sort keys must be unique per row — same determinism
    * contract as [[withGlobalRank]].
    */
  def withGlobalPrefixAggs(df: DataFrame, sortCols: Seq[Column],
                           aggs: Seq[(String, Column, String, Boolean)]): DataFrame = {
    require(aggs.nonEmpty)
    // materialize the cast agg values as real columns so both branches
    // (local window, per-partition totals) read identical longs
    val sorted = aggs.zipWithIndex.foldLeft(
      df
        .repartitionByRange(sortCols: _*)
        .withColumn("_pid", spark_partition_id())) {
      case (acc, ((_, value, _, _), i)) =>
        acc.withColumn(s"_val$i", value.cast("long"))
    }
    // Materialize the ranged frame as ONE RDD and hand BOTH branches a
    // DataFrame over it: the range bounds are sampled exactly once (at
    // this .rdd construction) and every consumer reads the same shuffle
    // files with the same partition indices — row→_pid agreement is
    // structural, not dependent on Spark's exchange-reuse rule firing.
    val spark0 = df.sparkSession
    val sortedRdd = sorted.rdd
    val sortedDf = spark0.createDataFrame(sortedRdd, sorted.schema)
    val base = Window.partitionBy("_pid").orderBy(sortCols: _*)
    val wIncl = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExcl = base.rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = aggs.zipWithIndex.foldLeft(sortedDf) {
      case (acc, ((_, _, fn, inclusive), i)) =>
        val w = if (inclusive) wIncl else wExcl
        val c = fn match {
          case "sum" => sum(col(s"_val$i")).over(w)
          case "min" => min(col(s"_val$i")).over(w)
          case other => throw new IllegalArgumentException(s"fn=$other")
        }
        acc.withColumn(s"_loc$i", c)
    }
    // per-partition totals: second branch over the SAME exchange
    // (reused, so the map work runs once and _pid labels agree)
    val totAggs = aggs.zipWithIndex.map { case ((_, _, fn, _), i) =>
      (fn match {
        case "sum" => sum(col(s"_val$i"))
        case _     => min(col(s"_val$i"))
      }).as(s"_t$i")
    }
    val tot = sortedDf.groupBy("_pid").agg(totAggs.head, totAggs.tail: _*)
    // exclusive prefix across partitions: bounded self-join over
    // ≤ shuffle-partitions rows (never a window, never a collect). A
    // partition with predecessors gets a 0 sum-offset even when every
    // predecessor total is NULL (all-null _val prefix) — the same
    // contract the old driver fold kept; min-offsets skip nulls.
    val offAggs = aggs.zipWithIndex.map { case ((_, _, fn, _), i) =>
      (fn match {
        case "sum" => when(count(col("b._pid")) > 0,
          coalesce(sum(col(s"b._t$i")), lit(0L)))
        case _     => min(col(s"b._t$i"))
      }).as(s"_o$i")
    }
    val offs = tot.as("a")
      .join(tot.as("b"), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid").as("_pid"))
      .agg(offAggs.head, offAggs.tail: _*)
    val combined = aggs.zipWithIndex.foldLeft(
      withLocal.join(broadcast(offs), Seq("_pid"))) {
      case (acc2, ((out, _, fn, _), i)) =>
        val off = col(s"_o$i")
        val c = fn match {
          case "sum" => coalesce(col(s"_loc$i"), lit(0L)) + coalesce(off, lit(0L))
          case _     => least(col(s"_loc$i"), off) // null-skipping by contract
        }
        // an all-null exclusive-sum (global first row, no offset) must
        // stay NULL like the window it replaces, not become 0
        val guarded = if (fn == "sum")
          when(col(s"_loc$i").isNull && off.isNull, lit(null)).otherwise(c)
        else c
        acc2.withColumn(out, guarded)
    }
    combined.drop("_pid" +:
      (aggs.indices.map(i => s"_loc$i") ++ aggs.indices.map(i => s"_val$i") ++
        aggs.indices.map(i => s"_o$i")): _*)
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
