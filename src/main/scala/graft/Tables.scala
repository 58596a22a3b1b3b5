package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy accessors for the test-data star schema (TPC-H-ish) living as one
  * parquet file per table under `dir`.
  *
  * Stands in for the reference's sources (see /root/reference
  * src/etl/extractors.py): `part`→Postgres products, `customer`→Postgres
  * customers, `events`→Kafka sales events, `lineitem` day rollup→MinIO
  * inventory snapshots. `documents`/`embeddings` feed the training-data
  * operators.
  */
final case class Tables(spark: SparkSession, dir: String) {

  /** Adaptive small-input spread.
    *
    * A compact parquet export often arrives as ONE row group — and a row
    * group is the atomic scan-split unit, so however many byte-range
    * tasks Spark plans, every row lands in the task holding the row
    * group's midpoint: the whole scan STAGE (decode + filters +
    * projections + in-row expansions — shingling, bigrams, codec work)
    * serializes onto one core while the other N−1 idle until the first
    * shuffle. Measured at sf0.1/local[32]: a documents shingle count
    * drops 3.1 s → 0.96 s with a spread scan.
    *
    * Rule: the EXPANSION-HEAVY tables ([[SpreadTables]]: text and
    * vector payloads, where one row fans out to hundreds of shingles /
    * bigrams / subvector products before the first shuffle) get one
    * round-robin repartition to the session's core count when their
    * input sits in [[SpreadMin]]..[[SpreadCap]]. Numeric fact tables
    * (lineitem, events, orders…) are deliberately NOT spread: their
    * first operation is usually an aggregation whose map-side partial
    * combine collapses the data BEFORE any shuffle — a pre-emptive
    * repartition would ship every raw row instead (measured: the
    * text/vector suite drops seconds per query with the spread, while
    * relational window/agg queries LOSE ~0.5–1 s each to it). The cap
    * is the 100 TB guard — genuinely large inputs split naturally into
    * many row groups/files and must NOT pay a full-data shuffle, so the
    * spread self-disables; the floor skips crumbs where near-empty
    * tasks cost more than they parallelize. Catalyst pushes predicates
    * and column pruning through Repartition, so PushedFilters still
    * reach the parquet scan (TablesSpec pins this), and every operator
    * orders its output, so round-robin placement never reaches results.
    */
  private val SpreadMin = 128L * 1024
  private val SpreadCap = 1L * 1024 * 1024 * 1024
  private val SpreadTables = Set("documents", "embeddings")

  private lazy val sizes = scala.collection.mutable.Map.empty[String, Long]

  private def inputBytes(name: String): Long =
    sizes.getOrElseUpdate(name, {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      try p.getFileSystem(spark.sessionState.newHadoopConf())
        .getContentSummary(p).getLength
      catch { case _: java.io.IOException => 0L }
    })

  private def t(name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    lazy val sz = inputBytes(name)
    if (SpreadTables(name) && sz >= SpreadMin && sz <= SpreadCap)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }

  /** `events.ts` arrives in whichever physical encoding the upstream
    * export chose — historically parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects without the legacy nanos-as-long conf),
    * currently a plain µs TIMESTAMP (TIMESTAMP_NTZ to Spark). Mirror the
    * reference's source tolerance (loaders.py:115 `_normalize_df`
    * coercion ladder, etl.py:26 `pd.to_datetime(..., utc=True)`): inspect
    * the type that actually arrived and normalize to a session-TZ
    * TimestampType µs column. DuckDB truncates ns→µs the same way, so
    * oracle comparisons agree on either encoding.
    *
    * The nanosAsLong conf is DELIBERATELY SESSION-WIDE: it is consulted
    * again at scan execution time, so a set-and-restore around this
    * (lazy) read would fail at runtime. The visible effect is that any
    * later nanos-timestamp parquet read in the session also arrives as
    * raw longs instead of erroring — acceptable for this engine's
    * sessions, which own their builder (see Bench/Verify/specs).
    */
  private def eventsRaw: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // read unadjusted (NTZ) parquet timestamps as session-TZ TimestampType
    // AT THE SCAN instead of casting after: with the UTC session the
    // values are identical, but a post-scan cast would block predicate
    // pushdown — this way ts range filters reach the parquet row-group
    // stats (TablesSpec pins PushedFilters). Session-wide like
    // nanosAsLong, same rationale.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = t("events")
    raw.schema("ts").dataType match {
      // TIMESTAMP(NANOS) read as raw longs: truncate ns → µs
      case LongType      => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      // any remaining flavor (e.g. NTZ surfacing despite the conf):
      // with the UTC session timezone this cast is a wall-clock identity
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = eventsRaw
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
