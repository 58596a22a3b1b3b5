package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a single-space-tokenized string, as one native
  * expression.
  *
  * The declarative formulation (`transform(sequence(...), i ->
  * concat(element_at(toks, i), ...))`) pays an interpreted lambda dispatch
  * per *element*; this expression is one JVM call per *row* with a tight
  * loop inside (measured ~4× on the shingling stage of the dedup
  * pipeline). Token/gram values are byte-identical to
  * `split(text, ' ')` + join-with-space, so the DuckDB oracle
  * (`string_split`-based) is unaffected.
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    // limit -1 keeps trailing empty tokens — same as split(text, ' ') and
    // DuckDB string_split
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    if (words.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](words.length - n + 1)
      var i = 0
      while (i < out.length) {
        val slice = new Array[UTF8String](n)
        var j = 0
        while (j < n) { slice(j) = words(i + j); j += 1 }
        out(i) = UTF8String.concatWs(space, slice: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  def apply(c: Column, n: Int): Column =
    GraftBridge.toColumn(WordNGrams(GraftBridge.toExpression(c), n))
}
