package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One input row for the quantile sketch: the 60-bit portable row-identity
  * hash (level assignment + tie-breaks) and the measure in integer cents.
  */
case class KllIn(h: Long, cents: Long)

/** Hash-leveled quantile-sketch state: the minimal cutoff level and every
  * (cents, rowHash) pair whose hash level is ≥ the cutoff, sorted. A pure
  * function of the input MULTISET — see [[KllOps]].
  */
case class KllState(cut: Int, items: Vector[(Long, Long)])

/** One partial sketch (a [[KllPartial]] wire vector) for the merge level. */
case class KllPartialIn(s: Seq[Long])

/** Finished sketch: retained-sample size, cutoff level, Horvitz-Thompson
  * total estimate (m·2^cut), and two interpolated quantiles.
  */
case class KllOut(m: Long, cut: Int, n_est: Long,
    p50_price: Double, p90_price: Double)

/** KLL-family mergeable quantile sketch with HASH-DECIDED level
  * assignment — the determinization that makes a quantile rollup
  * oracle-replayable.
  *
  * Classic KLL promotes items between levels with coin flips at compaction
  * time, so its state depends on arrival order and an external engine
  * cannot replay it. Here the level is pinned to the item's own portable
  * 60-bit row hash — `level(h) = trailing zero bits of h`, so
  * P(level ≥ j) = 2⁻ʲ exactly as in the random-promotion analysis — and
  * the state keeps every item whose level clears the MINIMAL cutoff `L`
  * under the capacity bound:
  *
  *   L(S) = min { j ≥ 0 : |{x ∈ S : level(x) ≥ j}| ≤ cap }
  *   state(S) = { x ∈ S : level(x) ≥ L(S) }
  *
  * That state is a pure function of the input multiset (no arrival-order
  * or partitioning dependence), which buys the two properties the 100 TB
  * rollup needs:
  *
  *  - LOSSLESS MERGE IDENTITY: merge(state(A), state(B)) = state(A ∪ B)
  *    exactly — counts only grow with more data, so L(A∪B) ≥ max(L_A,L_B),
  *    and every item of state(A∪B) therefore survives in one of the two
  *    partials. The identity is verified end-to-end by the DuckDB oracle
  *    computing the top-level sketch DIRECTLY from raw rows
  *    (q_sketch_quantiles), the q_sketch_merge contract extended to
  *    quantiles.
  *  - ENGINE-PORTABLE REPLAY: levels are integer bit math
  *    (`floor(log2(h & −h))` on the shared md5-derived hash), the cutoff
  *    is a count threshold, and the quantile interpolation is the
  *    repo-standard tenths-of-cents integer form — every step exact SQL.
  *
  * Retained items are Bernoulli(2⁻ᴸ) inclusions decided per-item, so the
  * sample is uniform: rank error is O(√(1/m)) with high probability
  * (KLL's compactor correlation is traded for replayability; capacity is
  * the knob). The spec asserts the bound against exact percentiles.
  */
object KllOps {

  /** Level of a row hash: trailing zero bits, capped at 60 (the hash is
    * 60-bit, and a zero hash — probability 2⁻⁶⁰ — must not return 64).
    */
  def level(h: Long): Int =
    math.min(java.lang.Long.numberOfTrailingZeros(h), 60)

  private val ord: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Long)

  /** Raise the cutoff one level at a time until the state fits `cap` —
    * each raise is expected to halve the retained set. The loop keeps the
    * cutoff MINIMAL given the data seen, which is what makes the state
    * order-independent (a cutoff can never overshoot and drop items a
    * different arrival order would have kept).
    */
  def raise(cap: Int, st: KllState): KllState = {
    var cut = st.cut
    var items = st.items
    while (items.length > cap && cut < 60) {
      cut += 1
      items = items.filter { case (_, h) => level(h) >= cut }
    }
    KllState(cut, items)
  }

  def insert(cap: Int)(st: KllState, h: Long, cents: Long): KllState =
    if (level(h) < st.cut) st
    else {
      val e = (cents, h)
      val p = st.items.search(e)(ord) match {
        case scala.collection.Searching.Found(i)          => i
        case scala.collection.Searching.InsertionPoint(i) => i
      }
      raise(cap, KllState(st.cut, st.items.patch(p, Vector(e), 0)))
    }

  def merge(cap: Int)(a: KllState, b: KllState): KllState = {
    val cut = math.max(a.cut, b.cut)
    val items = (a.items ++ b.items)
      .filter { case (_, h) => level(h) >= cut }
      .sorted(ord)
    raise(cap, KllState(cut, items))
  }

  /** Interpolated quantile at p = p10/10 over the sorted retained values,
    * in tenths-of-cents integer math (the repo-standard replayable form).
    */
  def quantileTenths(sorted: Vector[Long], p10: Int): Double = {
    val n = sorted.length
    if (n == 0) return Double.NaN
    val idx10 = (n - 1).toLong * p10
    val lo = (idx10 / 10).toInt
    val f = (idx10 % 10).toInt
    val v10 =
      if (f == 0) sorted(lo) * 10
      else sorted(lo) * (10 - f) + sorted(lo + 1) * f
    v10.toDouble / 1000.0
  }

  def finish(st: KllState): KllOut = {
    val vals = st.items.map(_._1) // sorted by (cents, h) ⇒ cents ascending
    KllOut(st.items.length.toLong, st.cut,
      st.items.length.toLong << st.cut,
      quantileTenths(vals, 5), quantileTenths(vals, 9))
  }

  /** Wire format between aggregation levels: cutoff, then the sorted
    * (cents, hash) pairs interleaved — a flat long array survives any
    * shuffle/codegen boundary without a custom encoder.
    */
  def toWire(st: KllState): Seq[Long] =
    st.cut.toLong +: st.items.flatMap { case (c, h) => Vector(c, h) }

  def fromWire(s: Seq[Long]): KllState = {
    val v = s.toVector
    KllState(v.head.toInt,
      v.tail.grouped(2).map(p => (p(0), p(1))).toVector)
  }
}

/** Level-1 partial: raw rows → wire-format sketch state (the mergeable
  * intermediate shipped between rollup levels, like [[KmvSketch]]).
  */
class KllPartial(cap: Int) extends Aggregator[KllIn, KllState, Seq[Long]] {
  override def zero: KllState = KllState(0, Vector.empty)
  override def reduce(b: KllState, in: KllIn): KllState =
    KllOps.insert(cap)(b, in.h, in.cents)
  override def merge(a: KllState, b: KllState): KllState =
    KllOps.merge(cap)(a, b)
  override def finish(b: KllState): Seq[Long] = KllOps.toWire(b)
  override def bufferEncoder: Encoder[KllState] = Encoders.kryo[KllState]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** State-to-state merge: folds partial wire states into the wire state
  * of their union WITHOUT finishing — the fold step of an incremental
  * sketch-state table ([[graft.sources.Sinks.mergeKllState]]), where the
  * merged state must remain mergeable with tomorrow's batch.
  */
class KllMergeState(cap: Int)
    extends Aggregator[KllPartialIn, KllState, Seq[Long]] {
  override def zero: KllState = KllState(0, Vector.empty)
  override def reduce(b: KllState, in: KllPartialIn): KllState =
    KllOps.merge(cap)(b, KllOps.fromWire(in.s))
  override def merge(a: KllState, b: KllState): KllState =
    KllOps.merge(cap)(a, b)
  override def finish(b: KllState): Seq[Long] = KllOps.toWire(b)
  override def bufferEncoder: Encoder[KllState] = Encoders.kryo[KllState]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Level-2 merge: folds partial states into the state of their union and
  * finishes to the quantile estimates — never revisiting raw rows.
  */
class KllMergeAgg(cap: Int) extends Aggregator[KllPartialIn, KllState, KllOut] {
  override def zero: KllState = KllState(0, Vector.empty)
  override def reduce(b: KllState, in: KllPartialIn): KllState =
    KllOps.merge(cap)(b, KllOps.fromWire(in.s))
  override def merge(a: KllState, b: KllState): KllState =
    KllOps.merge(cap)(a, b)
  override def finish(b: KllState): KllOut = KllOps.finish(b)
  override def bufferEncoder: Encoder[KllState] = Encoders.kryo[KllState]
  override def outputEncoder: Encoder[KllOut] = Encoders.product[KllOut]
}
