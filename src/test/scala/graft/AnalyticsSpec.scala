package graft

import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {

  test("attribution matches an in-memory first/last-touch replay") {
    val evs = sf.events
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val touchTypes = Set("view", "click", "signup")
    case class Hit(first: String, last: String, cents: BigDecimal)
    val hits = evs.groupBy(_._1).values.flatMap { userEvs =>
      var first: String = null
      var last: String = null
      userEvs.sortBy(e => (e._2.getTime, e._3)).flatMap { e =>
        if (touchTypes(e._4)) { if (first == null) first = e._4; last = e._4 }
        if (e._4 == "purchase")
          Some(Hit(if (first == null) "direct" else first,
            if (last == null) "direct" else last,
            BigDecimal(e._5).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
        else None
      }
    }.toSeq
    val expFirst = hits.groupBy(_.first).view
      .mapValues(h => (h.size.toLong, h.map(_.cents).sum)).toMap
    val expLast = hits.groupBy(_.last).view
      .mapValues(h => (h.size.toLong, h.map(_.cents).sum)).toMap
    val got = Analytics.attribution(sf).collect()
    assert(got.map(_.getString(0)).toSet == (expFirst.keySet ++ expLast.keySet))
    got.foreach { r =>
      val ch = r.getString(0)
      val (fn, fr) = expFirst.getOrElse(ch, (0L, BigDecimal(0)))
      val (ln, lr) = expLast.getOrElse(ch, (0L, BigDecimal(0)))
      assert(r.getLong(1) == fn && r.getDouble(2) == fr.toDouble,
        s"first-touch mismatch for $ch")
      assert(r.getLong(3) == ln && r.getDouble(4) == lr.toDouble,
        s"last-touch mismatch for $ch")
    }
    // the window must actually distinguish the two models at this SF
    assert(got.exists(r => r.getLong(1) != r.getLong(3)))
  }

  test("attribution scans and windows the events table exactly once") {
    val plan = Analytics.attribution(sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // both attribution models ride one scan + one user-partitioned window
    // (the naive per-model groupBy + full-outer join doubles both)
    assert("Scan parquet".r.findAllIn(plan).size == 1)
    assert("Window".r.findAllIn(plan).size == 1)
  }

  test("window funnel levels match the EXISTS-chain replay") {
    val W = 6L * 3600L * 1000000L
    val evs = sf.events.select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        (r.getTimestamp(1).getNanos / 1000) % 1000, r.getString(2)))
    val byUser = evs.groupBy(_._1)
    val expected = byUser.map { case (u, es) =>
      val views = es.filter(_._3 == "view").map(_._2)
      val clicks = es.filter(_._3 == "click").map(_._2)
      val purchases = es.filter(_._3 == "purchase").map(_._2)
      val l2 = views.exists(v => clicks.exists(c => c > v && c <= v + W))
      val l3 = views.exists(v => clicks.exists(c => c > v &&
        purchases.exists(p => p > c && p <= v + W)))
      u -> (if (l3) 3 else if (l2) 2 else if (views.nonEmpty) 1 else 0)
    }
    val got = Analytics.windowFunnel(sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
    assert(got.values.toSet.size > 1, "degenerate level distribution")
  }

  test("window funnel is one window pass: no self-join on events") {
    val plan = Analytics.windowFunnel(sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert("Scan parquet".r.findAllIn(plan).size == 1)
  }

  test("linear resample interpolates hour marks between surrounding events") {
    import graft.operators.TimeSeries
    val HourUs = 3600000000L
    val evs = sf.events.select("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        (r.getTimestamp(1).getNanos / 1000) % 1000, r.getDouble(2)))
    val expected = evs.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(_._2)
      val (lo, hi) = (sorted.head._2, sorted.last._2)
      val start = ((lo + HourUs - 1) / HourUs) * HourUs
      val stop = (hi / HourUs) * HourUs
      (start to stop by HourUs).flatMap { g =>
        val prev = sorted.filter(_._2 <= g).lastOption
        val next = sorted.find(_._2 > g).orElse(
          sorted.find(_._2 == g)) // exact hit: prev == next event
        (prev, sorted.find(_._2 >= g)) match {
          case (Some((_, pt, pv)), Some((_, nt, nv))) =>
            val v = if (pt == nt) pv
              else pv + (nv - pv) * ((g - pt).toDouble / (nt - pt))
            Some((u, g, v))
          case _ => None
        }
      }
    }.toSet
    val got = TimeSeries.resampleLinear(sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000, r.getDouble(2)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("linear resample emits a mark that coincides exactly with an event") {
    import graft.operators.TimeSeries
    import java.sql.Timestamp
    val spark2 = spark
    import spark2.implicits._
    val events = Seq(
      (1L, Timestamp.valueOf("2025-01-01 10:30:00"), 10.0),
      (1L, Timestamp.valueOf("2025-01-01 11:00:00"), 20.0), // ON the mark
      (1L, Timestamp.valueOf("2025-01-01 12:30:00"), 50.0))
      .toDF("user_id", "ts", "value")
    val got = TimeSeries.resampleEvents(events).collect()
      .map(r => r.getTimestamp(1).toString -> r.getDouble(2)).toMap
    // 11:00 is an exact hit: the mark must exist and carry the event value
    assert(got("2025-01-01 11:00:00.0") == 20.0)
    // 12:00 interpolates between 11:00 (20.0) and 12:30 (50.0)
    assert(got("2025-01-01 12:00:00.0") == 20.0 + 30.0 * (3600.0 / 5400.0))
    assert(got.size == 2)
  }
}
