package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass Jaccard similarity of two string arrays.
  *
  * Semantically identical to
  * `size(array_intersect(a,b)) / size(array_union(a,b))` (distinct-set
  * semantics, double division of the integer counts — so oracle results
  * are unchanged bit-for-bit), but computed with one hash set and no
  * intermediate array allocations: the built-in formulation materializes
  * both the intersection and union arrays per pair, which dominates the
  * dedup verification joins.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"jaccard_sim requires array<string> inputs, got $l / $r")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[UTF8String](xs.numElements() * 2)
    var i = 0
    while (i < xs.numElements()) { setA.add(xs.getUTF8String(i)); i += 1 }
    val seenB = new java.util.HashSet[UTF8String](ys.numElements() * 2)
    var inter = 0
    var bOnly = 0
    i = 0
    while (i < ys.numElements()) {
      val y = ys.getUTF8String(i)
      if (seenB.add(y)) {
        if (setA.contains(y)) inter += 1 else bOnly += 1
      }
      i += 1
    }
    val union = setA.size() + bOnly
    if (union == 0) null else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  def apply(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      JaccardSim(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
