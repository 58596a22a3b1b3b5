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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf) and truncate to
    * microseconds — the same ns→µs truncation DuckDB applies, so oracle
    * comparisons agree.
    *
    * DELIBERATELY SESSION-WIDE: the conf is consulted again at scan
    * execution time, so a set-and-restore around this (lazy) read would
    * fail at runtime. The visible effect is that any later nanos-timestamp
    * parquet read in the session also arrives as raw longs instead of
    * erroring — acceptable for this engine's sessions, which own their
    * builder (see Bench/Verify/specs); callers embedding graft in a
    * session that must keep strict nanos rejection should read events
    * through a separate session.
    */
  private def eventsRaw: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn(
      "ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
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
