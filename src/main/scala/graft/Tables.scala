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
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
