package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard similarity of two SORTED-DISTINCT long arrays via a linear
  * merge — the codegen'd fast path of the dedup verification joins.
  *
  * Contract: both inputs are ascending-sorted arrays of distinct longs
  * (e.g. `sort_array(collect_set(xxhash64(gram)))`). Intersection is then
  * a two-pointer merge: no per-pair hash sets, no string comparisons, and
  * gram payloads cross the shuffle as 8-byte longs instead of text.
  * Values equal [[JaccardSim]] over the original string sets whenever the
  * 64-bit gram hash is collision-free (P ≈ |G|²·2⁻⁶⁴ per doc).
  */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_jaccard requires array<bigint> inputs, got $l / $r")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val na = xs.numElements()
    val nb = ys.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) null else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $inter++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |int $union = $na + $nb - $inter;
         |if ($union == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = (double) $inter / $union; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedLongJaccard {
  def apply(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      SortedLongJaccard(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}

/** Intersection CARDINALITY of two sorted-distinct long arrays (same
  * contract and merge loop as [[SortedLongJaccard]]) — the building block
  * for asymmetric set scores (containment |A∩B|/|A|) where the caller
  * supplies its own denominator.
  */
case class SortedLongOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_overlap requires array<bigint> inputs, got $l / $r")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val na = xs.numElements()
    val nb = ys.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val inter = ctx.freshName("inter")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $inter = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $inter++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongOverlap =
    copy(left = newLeft, right = newRight)
}

object SortedLongOverlap {
  def apply(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      SortedLongOverlap(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
