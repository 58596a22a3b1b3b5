package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics text operators: keyword extraction and
  * deterministic dataset splitting.
  */
object TextRank {

  /** Keyword extraction, tf-idf shaped but integer-exact: score =
    * tf · 10⁶ div df (term frequency over document frequency). Avoiding
    * `ln` keeps the score bit-identical across engines (libm vs JVM log
    * differ in the last ulp); the RANKING is the same monotone order as
    * tf·log-idf for fixed tf. Top-3 terms per doc, ties by term.
    */
  def keywords(t: Tables): DataFrame = {
    val terms = t.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .withColumn("score", expr("tf * 1000000L div df").cast("long"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("doc_id", "rk", "term", "tf", "df", "score")
      .orderBy("doc_id", "rk")
  }

  val keywordsSql: String =
    """SELECT doc_id, rk, term, tf, df, score FROM (
      | SELECT doc_id, term, tf, df,
      |  CAST(tf * 1000000 // df AS BIGINT) AS score,
      |  ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY CAST(tf * 1000000 // df AS BIGINT) DESC, term) AS rk
      | FROM (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY doc_id, term) tf
      | JOIN (
      |  SELECT term, COUNT(*) AS df
      |  FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY term) df USING (term))
      |WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin

  /** Deterministic train/val/test split by content hash — the standard
    * leakage-safe split for training corpora: the assignment depends only
    * on the document identity (md5 prefix), not on partitioning, order,
    * or RNG state, so it is stable across runs and engines.
    */
  def trainTestSplit(t: Tables): DataFrame =
    t.documents
      .withColumn("bucket", substring(md5(col("text")), 1, 2))
      .withColumn("split",
        when(col("bucket") < "cc", "train")          // ~80%
          .when(col("bucket") < "e6", "val")          // ~10%
          .otherwise("test"))                         // ~10%
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("split", "lang")

  val trainTestSplitSql: String =
    """SELECT split, lang, COUNT(*) AS n_docs,
      | CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM (
      | SELECT lang, n_chars,
      |  CASE WHEN substr(md5(text), 1, 2) < 'cc' THEN 'train'
      |       WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
      |       ELSE 'test' END AS split
      | FROM documents)
      |GROUP BY split, lang
      |ORDER BY split, lang""".stripMargin
}
