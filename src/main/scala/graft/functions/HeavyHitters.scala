package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed [[Aggregator]] — bounded
  * memory (≤ k counters per partial) regardless of input cardinality.
  *
  * Guarantee: after processing n items, every item with true frequency
  * > n/k is present in the sketch (merging partials preserves this —
  * counts are summed, then all counters are decremented by the (k+1)-th
  * largest so at most k survive). The sketch therefore yields a
  * CANDIDATE SUPERSET of the heavy hitters: callers re-count candidates
  * exactly and filter, so the final answer is deterministic and exact
  * even though the intermediate sketch is partition-order dependent —
  * the same sound-candidates-then-verify shape the dedup family uses.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1L)
      case None if buf.size < k => buf.updated(item, 1L)
      case None => // decrement all; drop zeros (classic MG step)
        buf.flatMap { case (g, c) => if (c > 1L) Some(g -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (g, c)) =>
      acc.updated(g, acc.getOrElse(g, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (g, c) => if (c > cut) Some(g -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[String] = buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    implicitly[Encoder[Map[String, Long]]](Encoders.kryo[Map[String, Long]])

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
