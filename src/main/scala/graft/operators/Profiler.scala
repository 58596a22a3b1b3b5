package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality sweep an ETL node runs before
  * loading (row counts, null rates, cardinality, ranges per column).
  * One pass over the table computes every column's stats as a single
  * aggregation (no per-column rescans); output is long-form
  * (column, metric rows) so the schema is stable across tables.
  */
object Profiler {

  /** Generic profile of any DataFrame: one row per column. ONE job — the
    * row count rides in the same aggregation as the per-column stats
    * (`count(lit(1))`), and the single collected row is bounded state
    * (4 scalars per column).
    */
  def profile(df: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("__total") +: df.schema.fields.toSeq.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"${f.name}__nonnull"),
        countDistinct(c).as(s"${f.name}__distinct"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val total = row.getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    df.schema.fields.zipWithIndex.map { case (f, i) =>
      (f.name, f.dataType.typeName, total,
        total - row.getLong(i * 4 + 1),
        row.getLong(i * 4 + 2),
        Option(row.get(i * 4 + 3)).map(_.toString).orNull,
        Option(row.get(i * 4 + 4)).map(_.toString).orNull)
    }.toSeq
      .toDF("col_name", "dtype", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
      .orderBy("col_name")
  }

  /** Profile of the customer table, with a closed-form SQL oracle. */
  def customerProfile(t: Tables): DataFrame =
    profile(t.customer.select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"))
      .drop("dtype") // engine-specific type names; the stats are the contract

  val customerProfileSql: String =
    """SELECT * FROM (
      | SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
      |  COUNT(*) - COUNT(c_custkey) AS n_null, COUNT(DISTINCT c_custkey) AS n_distinct,
      |  CAST(MIN(c_custkey) AS VARCHAR) AS min_val,
      |  CAST(MAX(c_custkey) AS VARCHAR) AS max_val FROM customer
      | UNION ALL
      | SELECT 'c_nationkey', COUNT(*), COUNT(*) - COUNT(c_nationkey),
      |  COUNT(DISTINCT c_nationkey),
      |  CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR) FROM customer
      | UNION ALL
      | SELECT 'c_acctbal', COUNT(*), COUNT(*) - COUNT(c_acctbal),
      |  COUNT(DISTINCT c_acctbal),
      |  CAST(MIN(c_acctbal) AS VARCHAR), CAST(MAX(c_acctbal) AS VARCHAR) FROM customer
      | UNION ALL
      | SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
      |  COUNT(DISTINCT c_mktsegment),
      |  MIN(c_mktsegment), MAX(c_mktsegment) FROM customer)
      |ORDER BY col_name""".stripMargin

  private val SkewTopN = 10

  /** Key-skew report — the diagnostic a shuffle-heavy pipeline runs
    * BEFORE picking a partitioning: the [[SkewTopN]] heaviest join/agg
    * keys with their row share and ratio to the mean key size. Exact
    * integer counts; the two divisions are the only float steps. The
    * per-key aggregation is the same single shuffle the real job would
    * do — the report costs one pass, and keys whose ratio is large are
    * the ones that need salting or AQE skew handling.
    */
  def skewReport(t: Tables): DataFrame = {
    val counts = t.lineitem.groupBy("l_partkey").agg(count(lit(1)).as("n"))
    val stats = counts.agg(
      sum(col("n")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(stats))
      .select(col("l_partkey"), col("n"),
        (col("n").cast("double") / col("total_rows")).as("row_share"),
        (col("n").cast("double") /
          (col("total_rows").cast("double") / col("n_keys"))).as("ratio_vs_mean"))
      .orderBy(col("n").desc, col("l_partkey"))
      .limit(SkewTopN)
  }

  val skewReportSql: String =
    s"""WITH c AS (
       | SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
       | FROM lineitem GROUP BY l_partkey),
       |s AS (SELECT CAST(SUM(n) AS BIGINT) AS total_rows,
       |  CAST(COUNT(*) AS BIGINT) AS n_keys FROM c)
       |SELECT l_partkey, n,
       | CAST(n AS DOUBLE) / total_rows AS row_share,
       | CAST(n AS DOUBLE) / (CAST(total_rows AS DOUBLE) / n_keys) AS ratio_vs_mean
       |FROM c, s
       |ORDER BY n DESC, l_partkey
       |LIMIT $SkewTopN""".stripMargin

  /** log10(1 + 1/d) for d = 1..9, computed ONCE and embedded verbatim
    * in both the Spark literals and the oracle SQL (Double.toString is
    * shortest-roundtrip, so the oracle parses back the identical bits —
    * no cross-engine log10 call whose last ulp could differ).
    */
  private val BenfordExpected: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1 + 1.0 / d))

  /** Benford first-digit audit of order totals — the classic fraud /
    * synthetic-data smell test a data-quality sweep runs on monetary
    * columns. One aggregation over the fact table produces the 9 digit
    * counts; shares divide exact longs in double and deviation from the
    * Benford expectation uses the shared literal table. (The synthetic
    * uniform prices fail Benford loudly — which is the point: the audit
    * DETECTS non-organic distributions.)
    */
  def benfordAudit(t: Tables): DataFrame = {
    val digit = substring(
      floor(col("o_totalprice")).cast("long").cast("string"), 1, 1).cast("int")
    val expected = BenfordExpected.foldLeft(lit(null).cast("double")) {
      case (acc, (d, e)) => when(col("digit") === d, lit(e)).otherwise(acc)
    }
    val wAll = Window.partitionBy()
    t.orders
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n"))
      // Benford's law is defined over first SIGNIFICANT digits 1..9;
      // totals in (0,1) (digit 0) or negatives fall outside the law's
      // domain and would also diverge from the oracle's inner join /
      // integer cast — exclude them explicitly in BOTH engines
      .where(col("digit").between(1, 9))
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("share", col("n").cast("double") / col("total"))
      .withColumn("benford_expected", expected)
      .select(col("digit"), col("n"), col("share"), col("benford_expected"),
        (col("share") - col("benford_expected")).as("deviation"))
      .orderBy("digit")
  }

  val benfordAuditSql: String = {
    // CAST('…' AS DOUBLE), not a bare numeric literal: DuckDB types bare
    // decimal-point literals as DECIMAL and the int128→double conversion
    // double-rounds (one ulp off for 17-digit constants); the string cast
    // is a correctly-rounded strtod, identical to the JVM's parse.
    val exp = BenfordExpected
      .map { case (d, e) => s"($d, CAST('$e' AS DOUBLE))" }.mkString(", ")
    s"""WITH counts AS (
       | SELECT TRY_CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
       |   1, 1) AS INTEGER) AS digit, CAST(COUNT(*) AS BIGINT) AS n
       | FROM orders GROUP BY 1
       | HAVING digit BETWEEN 1 AND 9),
       |shares AS (
       | SELECT digit, n,
       |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS BIGINT) AS share
       | FROM counts),
       |exp AS (SELECT * FROM (VALUES $exp) e(digit, benford_expected))
       |SELECT s.digit, s.n, s.share, e.benford_expected,
       | s.share - e.benford_expected AS deviation
       |FROM shares s JOIN exp e ON e.digit = s.digit
       |ORDER BY s.digit""".stripMargin
  }

  /** Per-source corpus health report — the one table a dataset owner
    * reads before green-lighting a training run (the composed
    * dashboard over signals the per-doc operators already compute):
    * document count, redundant exact-duplicate docs (group size − 1
    * summed over md5(text) groups), non-English share (via
    * [[TextAnalysis.langId]]'s predicted language — operator
    * composition, not re-derivation), and token volume. Every rate
    * divides exact integers in double with the oracle's tree — no
    * partition-order-dependent double sums anywhere.
    *
    * Plan: one hash-group pass for dup groups (corpus-keyed but
    * map-side combining), the langId projection (row-local), one
    * source-keyed aggregation. All joins on doc_id/hash keys.
    */
  def corpusReport(t: Tables): DataFrame = {
    val docs = t.documents.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("toks"),
      md5(col("text")).as("h"))
    val dupG = docs.groupBy("h").agg(count(lit(1)).as("cnt"))
    val lang = TextAnalysis.langId(t).select(col("doc_id"),
      col("predicted_lang"))
    docs.join(dupG, "h").join(lang, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).cast("long")
          .as("n_in_dup_groups"),
        sum(when(col("predicted_lang") =!= "en", 1L).otherwise(0L))
          .cast("long").as("n_non_en"),
        sum(col("toks")).cast("long").as("total_tokens"))
      .select(col("source"), col("n_docs"), col("n_in_dup_groups"),
        col("n_non_en"), col("total_tokens"),
        (col("n_in_dup_groups").cast("double") / col("n_docs"))
          .as("dup_rate"),
        (col("n_non_en").cast("double") / col("n_docs")).as("non_en_rate"),
        (col("total_tokens").cast("double") / col("n_docs"))
          .as("mean_tokens"))
      .orderBy("source")
  }

  lazy val corpusReportSql: String =
    s"""WITH lang AS (${TextAnalysis.langIdSql}),
       |docs AS (
       | SELECT doc_id, source,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
       |  md5(text) AS h
       | FROM documents),
       |dupg AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS cnt FROM docs GROUP BY 1),
       |g AS (
       | SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_in_dup_groups,
       |  CAST(SUM(CASE WHEN predicted_lang <> 'en' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_non_en,
       |  CAST(SUM(toks) AS BIGINT) AS total_tokens
       | FROM docs
       | JOIN dupg USING (h)
       | JOIN lang USING (doc_id)
       | GROUP BY 1)
       |SELECT source, n_docs, n_in_dup_groups, n_non_en, total_tokens,
       | CAST(n_in_dup_groups AS DOUBLE) / n_docs AS dup_rate,
       | CAST(n_non_en AS DOUBLE) / n_docs AS non_en_rate,
       | CAST(total_tokens AS DOUBLE) / n_docs AS mean_tokens
       |FROM g ORDER BY source""".stripMargin
}
