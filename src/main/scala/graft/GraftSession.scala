package graft

import org.apache.spark.sql.SparkSession

/** Session factory tuned for the graft engine.
  *
  * The same knobs scale from `local[N]` to a multi-executor cluster:
  *  - AQE re-plans shuffle partition counts, converts sort-merge joins to
  *    broadcast at runtime, and splits skewed partitions.
  *  - `spark.sql.shuffle.partitions` is the static fallback (32 locally;
  *    on a 1000-executor cluster you would raise it or rely on AQE).
  *  - `files.maxPartitionBytes` sizes scan tasks so a 100 TB input splits
  *    into bounded units of work.
  */
object GraftSession {

  def builder(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      // ObjectHashAggregate (collect_set/collect_list/typed-imperative
      // aggs) falls back to SORT-BASED aggregation once a task's hash map
      // exceeds this many entries; the Spark default of 128 makes every
      // multi-group collect aggregation pay a per-task sort. 64k entries
      // of bounded per-group state (this engine's collects are all
      // bounded-array model/group state) is well within task memory at
      // any scale; override via spark.sql.objectHashAggregate.* conf on
      // clusters with tighter executors (r17 guide §1.2 step-3 config
      // pass; results are identical either way — only the agg strategy
      // changes).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_FALLBACK", "65536"))
      .config("spark.ui.enabled", "false")

  /** Shared session for tests / local runs. */
  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
