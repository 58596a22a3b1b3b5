package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word n-gram shingling shared by the dedup / text-analysis operators.
  *
  * Tokenization is a plain split on single spaces so the DuckDB oracle
  * (`string_split(text, ' ')`) sees byte-identical tokens.
  */
object Shingles {

  /** Distinct word-3-gram set of a text column, via the native
    * [[WordNGrams]] expression (one JVM call per row instead of an
    * interpreted lambda per gram) — THE shingling definition; batch
    * dedup and the streaming near-dup gate must agree on it, so both
    * call this.
    */
  def grams3(text: Column): Column = array_distinct(WordNGrams(text, 3))

  /** doc_id + distinct word-3-gram projection of the documents table. */
  def gramsOf(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    documents.select(col("doc_id"), grams3(col("text")).as("grams"))

  /** DuckDB equivalent of [[grams3]] for oracle SQL. */
  def grams3Sql(c: String): String =
    s"""CASE WHEN len(string_split($c, ' ')) >= 3 THEN
       |  list_distinct(list_transform(range(1, len(string_split($c, ' ')) - 1),
       |    i -> string_split($c, ' ')[i] || ' ' || string_split($c, ' ')[i+1] || ' ' || string_split($c, ' ')[i+2]))
       |ELSE [] END""".stripMargin

  /** Exact Jaccard similarity of two string arrays (distinct-set
    * semantics, intersection over union in double) — the native
    * single-pass [[JaccardSim]] expression.
    */
  def jaccard(a: Column, b: Column): Column = JaccardSim(a, b)
}
