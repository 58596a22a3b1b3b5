package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
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
}
