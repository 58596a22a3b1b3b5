package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Karp-Rabin) rolling hash over a string's UTF-8 bytes:
  * h = Σ byteᵢ · B^(n-1-i) mod M, with B=257, M=2⁶¹−1 (Mersenne; see
  * [[RollingHash.step]] for the overflow-free reduction).
  *
  * A native Catalyst `Expression` with `doGenCode` so document
  * fingerprinting stays inside whole-stage codegen (a Scala UDF would
  * break the codegen span and serialize per-row).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string input, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = RollingHash.step(h, bytes(i))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i     = ctx.freshName("i")
      val h     = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = graft.functions.RollingHash.step($h, $bytes[$i]);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Base: Long = 257L
  final val Mod: Long  = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** One hash step; called from both interpreted eval and generated code.
    *
    * h < 2^61, so h·257 spans up to 2^69 — the product is formed as a
    * 128-bit (hi, lo) pair and reduced with the Mersenne identities
    * 2^64 ≡ 8 and 2^61 ≡ 1 (mod 2^61−1), keeping the fingerprint space at
    * 61 bits (birthday bound ~2^30.5 docs, vs ~65k at the 31-bit modulus).
    */
  def step(h: Long, b: Byte): Long = {
    val lo = h * Base // wrapping low 64 bits
    val hi = Math.multiplyHigh(h, Base)
    var r = (lo & Mod) + (lo >>> 61) + (hi << 3)
    if (r >= Mod) r -= Mod
    r += (b & 0xFFL)
    if (r >= Mod) r -= Mod
    r
  }

  /** Column API: `RollingHash(col("text"))`. */
  def apply(c: Column): Column =
    GraftBridge.toColumn(RollingHash(GraftBridge.toExpression(c)))
}
