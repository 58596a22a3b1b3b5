package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Whole-document MinHash signature in ONE expression call: all 128
  * per-permutation minima computed in a single pass over the gram array.
  *
  * The HOF-free alternative (explode grams → groupBy(doc) with 128 min
  * aggregates) shuffles every (doc, gram) pair and runs a 128-column
  * aggregate; this expression keeps signature construction a NARROW map
  * over the corpus — no shuffle at all until LSH banding. Per gram: one
  * xxhash64 of the bytes, then 128 cheap long re-hashes (XOR a fixed
  * mix constant, xxhash64 the long) — the same construction the
  * aggregate formulation used, so banding behavior is unchanged.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string> input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val NumHashes = 128

  /** Deterministic mix constants (fixed LCG seed — no runtime RNG). */
  val mix: Array[Long] = {
    var s = 0x243f6a8885a308d3L
    Array.fill(NumHashes) { s = s * 6364136223846793005L + 1442695040888963407L; s }
  }

  def compute(arr: ArrayData): ArrayData = {
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var g = 0
    val n = arr.numElements()
    while (g < n) {
      val s = arr.getUTF8String(g)
      if (s != null) { // null elements contribute nothing (ignored grams)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < NumHashes) {
          val m = XXH64.hashLong(h ^ mix(i), 42L)
          if (m < mins(i)) mins(i) = m
          i += 1
        }
      }
      g += 1
    }
    new GenericArrayData(mins)
  }

  def apply(c: Column): Column =
    GraftBridge.toColumn(MinHashSig(GraftBridge.toExpression(c)))
}

/** Sorted xxhash64 array of a document's grams in ONE expression call
  * — the verify-stage payload for the dedup operators (codegen'd merge
  * loops score the sorted arrays). Per-element values are identical to
  * SQL `xxhash64(gram)` (same XXH64 over UTF-8 bytes, seed 42), so the
  * result equals `array_sort(transform(grams, x -> xxhash64(x)))` while
  * replacing the interpreted per-element HOF lambda with one tight JVM
  * loop per row.
  */
case class HashedSortedGrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_sorted_grams requires array<string> input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_sorted_grams"

  override protected def nullSafeEval(input: Any): Any =
    HashedSortedGrams.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedSortedGrams.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): HashedSortedGrams =
    copy(child = newChild)
}

object HashedSortedGrams {

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // a null gram hashes to the seed (42), exactly like SQL xxhash64 —
      // keeps the documented HOF equivalence true element-for-element
      out(i) =
        if (s == null) 42L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    GraftBridge.toColumn(HashedSortedGrams(GraftBridge.toExpression(c)))
}

/** Whole-document 60-bit SimHash in ONE expression call.
  *
  * Per gram the hash is the first 60 bits of md5 (== the big-endian
  * parse of the first 15 hex chars — the portable construction the
  * DuckDB oracle rebuilds), each bit votes ±1, and the signature sets
  * the bits with positive vote sums. Replaces an explode + 60-column
  * aggregate shuffle with a narrow map.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<string> input, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  val Bits = 60

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(utf8 bytes), big-endian — identical to parsing
    * the first 15 hex chars of the digest (the 4-bit shift drops the
    * 16th hex char).
    */
  def gramHash(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xFFL); i += 1 }
    h >>> 4
  }

  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    var g = 0
    val n = arr.numElements()
    while (g < n) {
      val s = arr.getUTF8String(g)
      if (s != null) { // null elements contribute no votes (ignored grams)
        val h = gramHash(s.getBytes)
        var j = 0
        while (j < Bits) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      g += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) { if (votes(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  def apply(c: Column): Column =
    GraftBridge.toColumn(SimHashSig(GraftBridge.toExpression(c)))
}
