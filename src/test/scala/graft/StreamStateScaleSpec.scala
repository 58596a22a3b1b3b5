package graft

import java.sql.Timestamp

import graft.streaming.Streams
import graft.streaming.Streams.{AttrEvent, Event}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming STATE-SCALE audit (r13 VERDICT item 6): each stateful
  * monitor's state cardinality contract — claimed in SURVEY §2.7 prose
  * — asserted mechanically. Every spec drives the stream with a
  * KEY-HEAVY load (events/docs ≫ the documented state bound) and pins
  * `stateOperators.numRowsTotal` at or under that bound: the number
  * proving the state store scales with windows × dims / distinct
  * signatures / active keys, never with raw event volume.
  */
class StreamStateScaleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2025-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  /** Total state rows across all stateful operators at the last
    * progress that reported any.
    */
  private def stateRows(q: StreamingQuery): Long = {
    val ps = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(ps.nonEmpty, "stream reported no stateful operators")
    ps.last.stateOperators.map(_.numRowsTotal).sum
  }

  test("distinct-count sketch state scales with windows x types, not users") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.distinctCountsStream(input.toDF())
      .writeStream.format("memory").queryName("dc_state")
      .outputMode("update").start()
    // 2000 events, 1000 distinct users, 2 types, 2 hour-windows: an
    // exact per-window distinct would hold ~1000 keys of state — the
    // HLL sketch must hold one row per (window, type) group
    val evs = (0 until 2000).map { i =>
      Event(i % 1000, ts((i % 2) * 60 + i % 50), if (i % 2 == 0) "click" else "view", 1.0)
    }
    input.addData(evs: _*)
    q.processAllAvailable()
    val rows = stateRows(q)
    q.stop()
    assert(rows <= 4L, s"HLL state should be windows x types = 4 rows, got $rows")
  }

  test("streaming dedup state scales with distinct keys, not event volume") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.dedupStream(input.toDF(), Seq("user_id"))
      .writeStream.format("memory").queryName("dedup_state")
      .outputMode("append").start()
    // 1500 events over 30 distinct keys
    input.addData((0 until 1500).map(i => Event(i % 30, ts(i % 59), "e", 1.0)): _*)
    q.processAllAvailable()
    val rows = stateRows(q)
    q.stop()
    assert(rows <= 30L, s"dedup state should be <= 30 distinct keys, got $rows")
  }

  test("near-dup gate state scales with distinct signatures, not doc volume") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = Streams.nearDupGateStream(docs)
      .writeStream.format("memory").queryName("ndg_state")
      .outputMode("append").start()
    // 600 docs but only 12 distinct texts → 12 simhash signatures
    input.addData((0 until 600).map { i =>
      (i.toLong, s"alpha beta gamma delta epsilon text${i % 12}", ts(i % 59))
    }: _*)
    q.processAllAvailable()
    val rows = stateRows(q)
    q.stop()
    assert(rows <= 12L, s"near-dup state should be <= 12 signatures, got $rows")
  }

  test("throttle state scales with active users, not event volume") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.throttleStream(input.toDS(), maxPerHour = 3)
      .writeStream.format("memory").queryName("throttle_state")
      .outputMode("append").start()
    // 800 events from 8 users inside two hours: state = one entry per
    // user holding a ≤watermark-bounded per-hour counter map
    input.addData((0 until 800).map(i => Event(i % 8, ts(i % 110), "e", i.toDouble)): _*)
    q.processAllAvailable()
    val rows = stateRows(q)
    q.stop()
    assert(rows <= 8L, s"throttle state should be <= 8 users, got $rows")
  }

  test("attribution state scales with users, not touch volume") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AttrEvent]
    val q = Streams.attributionStream(input.toDS())
      .writeStream.format("memory").queryName("attr_state")
      .outputMode("append").start()
    // 900 touches from 9 users: state = one (first, last, lastTs) per user
    input.addData((0 until 900).map { i =>
      AttrEvent(i % 9, ts(i % 59), 10000L + i, if (i % 50 == 0) "purchase" else "view",
        if (i % 50 == 0) 1.0 else 0.0)
    }: _*)
    q.processAllAvailable()
    val rows = stateRows(q)
    q.stop()
    assert(rows <= 9L, s"attribution state should be <= 9 users, got $rows")
  }

  test("session-window state scales with open sessions per user, not events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.sessionWindowStream(input.toDF())
      .writeStream.format("memory").queryName("sess_state")
      .outputMode("append").start()
    // 700 events, 7 users, each a single dense burst → 7 open sessions
    input.addData((0 until 700).map(i => Event(i % 7, ts(i % 25), "e", 1.0)): _*)
    q.processAllAvailable()
    val rows = stateRows(q)
    q.stop()
    assert(rows <= 7L, s"session state should be <= 7 open sessions, got $rows")
  }
}
