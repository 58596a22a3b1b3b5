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

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  test("ewma equals the trailing-20 left fold at each user's latest event") {
    import graft.operators.TimeSeries
    val evs = sf.events.select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1)), r.getLong(2),
        r.getDouble(3)))
    val expected = evs.groupBy(_._1).view.mapValues { es =>
      val vals = es.sortBy(e => (e._2, e._3)).map(_._4).takeRight(20)
      vals.reduceLeft((a, x) => (a + x) / 2)
    }.toMap
    val got = TimeSeries.ewmaSmooth(sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (u, e) =>
      assert(e == expected(u), s"ewma mismatch for user $u")
    }
  }

  test("kaplan-meier survival matches the exact KM replay with censoring") {
    import graft.operators.Analytics
    val perCust = sf.orders.select("o_custkey", "o_orderdate").collect()
      .map { r =>
        val d = (r.get(1) match {
          case t: java.sql.Timestamp => t.toLocalDateTime
          case t: java.time.LocalDateTime => t
        }).toLocalDate.toEpochDay
        (r.getLong(0), d)
      }
      .groupBy(_._1).view.mapValues(ds => (ds.map(_._2).min, ds.map(_._2).max))
      .toMap
    val end = perCust.values.map(_._2).max
    val durations = perCust.values.toSeq.map { case (f, l) =>
      (l - f, end - l >= 90)
    }
    val total = durations.size.toLong
    val byT = durations.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, g) => (t, g.count(_._2).toLong, g.size.toLong) }
    var removed = 0L
    var s = 1.0
    val expect = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long, Double)]
    byT.foreach { case (t, d, allT) =>
      val n = total - removed
      s = s * ((n - d).toDouble / n)
      removed += allT
      if (d > 0) expect += t -> ((n, d, s))
    }
    val got = Analytics.kaplanMeier(sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
    assert(got.map(_._1).toSeq == expect.keys.toSeq)
    got.foreach { case (t, v) => assert(v == expect(t), s"t=$t") }
    // survival is monotonically nonincreasing and in (0, 1]
    val surv = got.map(_._2._3)
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-15 })
    assert(surv.forall(x => x > 0.0 && x <= 1.0))
  }

  test("holt level/trend match the exact two-state fold replay per user") {
    import graft.operators.TimeSeries
    val evs = sf.events.select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1)), r.getLong(2),
        r.getDouble(3)))
    val expected = evs.groupBy(_._1).view.mapValues { es =>
      val vals = es.sortBy(e => (e._2, e._3)).map(_._4).takeRight(20)
      vals.tail.foldLeft((vals.head, 0.0)) { case ((l, b), x) =>
        val l2 = (x + l + b) / 2
        (l2, ((l2 - l) + b) / 2)
      }
    }.toMap
    val got = TimeSeries.holt(sf).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (u, (l, b, f)) =>
      val (el, eb) = expected(u)
      assert(l == el && b == eb, s"holt mismatch for user $u")
      assert(f == l + b)
    }
  }

  test("linear trend slope matches the exact OLS recount per brand") {
    import graft.operators.TimeSeries
    val parts = sf.part.select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val monthly = sf.lineitem
      .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      .collect()
      .groupBy { r =>
        val d = (r.get(1) match {
          case t: java.sql.Timestamp => t.toLocalDateTime
          case t: java.time.LocalDateTime => t
        }).toLocalDate.withDayOfMonth(1)
        (parts(r.getLong(0)), d)
      }
      .view.mapValues { rs =>
        rs.map { r =>
          BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
            (BigDecimal(1) -
              BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        }.sum
      }.toMap
    val expected = monthly.keys.groupBy(_._1).map { case (brand, ks) =>
      val minM = ks.map(_._2).min((a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b))
      val xy = ks.map { k =>
        val x = java.time.temporal.ChronoUnit.MONTHS.between(minM, k._2)
        val y = (monthly(k) * 100).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
        (x, y)
      }.toSeq
      val n = xy.size.toLong
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val (sxx, sxy) = (xy.map(p => p._1 * p._1).sum, xy.map(p => p._1 * p._2).sum)
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble / 100.0
      brand -> (n, slope)
    }
    val got = TimeSeries.linearTrend(sf).collect()
    assert(got.map(_.getString(0)).toSet == expected.filter(_._2._1 >= 3).keySet)
    got.foreach { r =>
      val (n, slope) = expected(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == slope, s"slope mismatch for ${r.getString(0)}")
    }
    // the report is sorted by slope descending
    val slopes = got.map(_.getDouble(2)).toSeq
    assert(slopes == slopes.sorted.reverse)
  }

  test("linear trend broadcasts the part dim; session paths windows stay entity-partitioned") {
    import graft.operators.TimeSeries
    val trendPlan = TimeSeries.linearTrend(sf).queryExecution.executedPlan.toString
    assert(trendPlan.contains("BroadcastHashJoin"), "part dim must broadcast")
    assert(!trendPlan.contains("SortMergeJoin"))
    val pathsPlan = Analytics.sessionPaths(sf).queryExecution.executedPlan.toString
    // every window must carry a partition spec — an unpartitioned window
    // would serialize the corpus through one task at scale
    assert(!pathsPlan.contains("windowspecdefinition(ts"),
      "session-path windows must be partitioned by user")
    assert("windowspecdefinition\\(user_id".r.findAllIn(pathsPlan).nonEmpty)
  }

  test("session paths census matches the 30-minute-gap replay") {
    val evs = sf.events.select("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1)), r.getLong(2),
        r.getString(3)))
    val paths = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[String]())
      var prev = Double.NaN
      sorted.foreach { e =>
        val s = e._2 / 1.0e6  // ts.cast("double") = epoch seconds as double
        if (!prev.isNaN && s - prev > 1800.0)
          sessions += scala.collection.mutable.ArrayBuffer[String]()
        sessions.last += e._4
        prev = s
      }
      sessions.map(_.take(3).mkString(">"))
    }
    val expected = paths.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 5).toMap
    val got = Analytics.sessionPaths(sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("rolling median equals the trailing-20 sorted-pick replay") {
    import graft.operators.TimeSeries
    val evs = sf.events.select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1)), r.getLong(2),
        r.getDouble(3)))
    val expected = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      sorted.indices.map { i =>
        val win = sorted.slice(math.max(0, i - 19), i + 1).map(_._4).sorted
        val n = win.length
        val m = if (n % 2 == 1) win((n + 1) / 2 - 1)
                else (win(n / 2 - 1) + win(n / 2)) / 2
        sorted(i)._3 -> m
      }
    }.toMap
    val got = TimeSeries.rollingMedian(sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, m) =>
      assert(m == expected(id), s"median mismatch at event $id")
    }
  }

  test("ab test reproduces the exact Welch t from integer power sums") {
    val cents = sf.events.where("event_type = 'purchase'")
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0) % 2,
        (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact))
    def toD(s: BigInt): Double = {
      val lo = s % 1000000000L; val hi = (s - lo) / 1000000000L
      hi.toDouble * 1.0e9 + lo.toDouble
    }
    def sums(g: Long) = {
      val xs = cents.filter(_._1 == g).map(_._2)
      (xs.length.toLong,
        toD(xs.foldLeft(BigInt(0))(_ + _)) / 100.0,
        toD(xs.foldLeft(BigInt(0))((a, x) => a + BigInt(x) * x)) / 10000.0)
    }
    val (na, da, qqa) = sums(0); val (nb, db, qqb) = sums(1)
    val (ma, mb) = (da / na, db / nb)
    val t = (ma - mb) / math.sqrt(
      (qqa - da * da / na) / (na - 1) / na + (qqb - db * db / nb) / (nb - 1) / nb)
    val r = graft.operators.Analytics.abTest(sf).collect()(0)
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(r.getDouble(2) == ma && r.getDouble(3) == mb)
    assert(r.getDouble(4) == ma - mb)
    assert(r.getDouble(5) == t, "t-stat must match the exact-sum replay")
  }

  test("new vs returning partitions each month's active customers") {
    val rows = graft.operators.Analytics.newVsReturning(sf).collect()
    val m = sf.orders.selectExpr("o_custkey",
        "cast(date_trunc('month', o_orderdate) as date) AS month")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val firstM = m.groupBy(_._1).view
      .mapValues(_.map(_._2).min((a: java.time.LocalDate, b: java.time.LocalDate) =>
        a.compareTo(b))).toMap
    val byMonth = m.groupBy(_._2)
    assert(rows.map(_.getDate(0).toLocalDate).toSet == byMonth.keySet)
    rows.foreach { r =>
      val month = r.getDate(0).toLocalDate
      val active = byMonth(month).map(_._1)
      val nNew = active.count(c => firstM(c) == month).toLong
      assert(r.getLong(1) == nNew)
      assert(r.getLong(2) == active.length - nNew)
      assert(r.getDouble(3) == nNew.toDouble / active.length)
    }
    // the first month is all-new; later months have returners at this SF
    assert(rows.head.getLong(2) == 0)
    assert(rows.exists(_.getLong(2) > 0))
  }

  test("seasonality shares sum to one across the seven weekdays") {
    val rows = graft.operators.Analytics.seasonality(sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 to 6))
    assert(rows.map(_.getLong(1)).sum == sf.orders.count())
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-12)
    val revTotal = rows.map(_.getDouble(2)).sum
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getDouble(2) / revTotal) < 1e-12)
    }
  }

  test("rolling correlation equals the exact trailing-7-day recount") {
    import graft.operators.TimeSeries
    val daily = sf.lineitem
      .selectExpr("cast(l_shipdate as date) d",
        "cast(cast(l_quantity as decimal(12,2)) * 100 as long) qc",
        "cast(cast(l_extendedprice as decimal(12,2)) * 100 as long) pc")
      .groupBy("d").agg(
        org.apache.spark.sql.functions.sum("qc").as("qc"),
        org.apache.spark.sql.functions.sum("pc").as("pc"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
      .sortBy(_._1.toEpochDay)
    def toD(s: BigInt): Double = {
      val lo = s % 1000000000L; val hi = (s - lo) / 1000000000L
      hi.toDouble * 1.0e9 + lo.toDouble
    }
    val expected = daily.indices.flatMap { i =>
      // trailing 7 CALENDAR days; only complete windows report
      val cur = daily(i)._1.toEpochDay
      val w = daily.filter(e =>
        e._1.toEpochDay > cur - 7 && e._1.toEpochDay <= cur)
      if (w.length != 7) None else Some {
      val n = 7L
      val (sq, sp) = (w.map(e => BigInt(e._2)).sum, w.map(e => BigInt(e._3)).sum)
      val sqq = w.map(e => BigInt(e._2) * e._2).sum
      val spp = w.map(e => BigInt(e._3) * e._3).sum
      val sqp = w.map(e => BigInt(e._2) * e._3).sum
      val (dsq, dsp, dsqq, dspp, dsqp) = (toD(sq), toD(sp), toD(sqq), toD(spp), toD(sqp))
      daily(i)._1 -> ((n * dsqp - dsq * dsp) /
        (math.sqrt(n * dsqq - dsq * dsq) * math.sqrt(n * dspp - dsp * dsp)))
    }}.toMap
    val got = TimeSeries.rollingCorr(sf).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (d, c) =>
      assert(c == expected(d), s"rolling corr mismatch at $d")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
    }
  }

  test("rolling corr and decay counters keep their scale-safe plan shapes") {
    import graft.operators.{Analytics, TimeSeries}
    val corrPlan = TimeSeries.rollingCorr(sf).queryExecution.executedPlan.toString
    // one fact scan; the global window runs AFTER the day aggregation
    // (over the bounded day domain), never over raw fact rows
    assert("Scan parquet".r.findAllIn(corrPlan).size == 1)
    assert(corrPlan.indexOf("Window") < corrPlan.indexOf("Scan parquet"),
      "window must sit above the day aggregate in the plan tree")
    assert(corrPlan.contains("HashAggregate"))
    val decayPlan = Analytics.decayedCounters(sf).queryExecution.executedPlan.toString
    // the as-of date joins as a broadcast single row — never a shuffle join
    assert(decayPlan.contains("BroadcastNestedLoopJoin") ||
      decayPlan.contains("BroadcastExchange"))
    assert(!decayPlan.contains("SortMergeJoin"))
    assert(!decayPlan.contains("CartesianProduct"))
  }

  test("funnel time matches the first-view-to-first-purchase replay") {
    val evs = sf.events.select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1)), r.getString(2)))
    val expected = evs.groupBy(_._1).flatMap { case (u, es) =>
      val views = es.filter(_._3 == "view").map(_._2)
      if (views.isEmpty) None
      else {
        val fv = views.min
        val ps = es.filter(e => e._3 == "purchase" && e._2 >= fv).map(_._2)
        if (ps.isEmpty) None
        else Some(u -> ((fv, ps.min, (ps.min - fv).toDouble / 1000000.0)))
      }
    }
    val got = graft.operators.Analytics.funnelTime(sf).collect()
      .map(r => r.getLong(0) ->
        ((micros(r.getTimestamp(1)), micros(r.getTimestamp(2)),
          r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, (fv, fp, lat)) =>
      assert(got(u) == ((fv, fp, lat)), s"funnel time mismatch for user $u")
    }
    // a purchase BEFORE the first view must not count as a conversion
    assert(evs.exists { case (u, t, ty) =>
      ty == "purchase" && expected.get(u).exists(t < _._1)
    }, "fixture sanity: some user purchases before their first view")
  }

  test("ship latency picks nearest-rank percentiles without ranking raw rows") {
    import graft.operators.Relational7
    import org.apache.spark.sql.functions.{col => c}
    val lat = sf.lineitem.join(sf.orders, c("l_orderkey") === c("o_orderkey"))
      .selectExpr("o_orderpriority",
        "datediff(cast(l_shipdate as date), cast(o_orderdate as date)) AS days")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val expected = lat.groupBy(_._1).map { case (p, rs) =>
      val days = rs.map(_._2).sorted
      val n = days.length
      def rank(q: Double) = days(math.ceil(q * n).toInt - 1)
      p -> ((n.toLong, rank(0.5), rank(0.9), days.last))
    }
    val got = Relational7.shipLatency(sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got == expected)
    // the exact rank selection must run over the aggregated day domain,
    // not rank the raw fact rows through a 5-partition window
    val plan = Relational7.shipLatency(sf).queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"), "no per-row ranking window")
  }

  test("decayed counters match the exact fixed-point replay") {
    import org.apache.spark.sql.functions.{col, to_date}
    val evs = sf.events
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("d"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toLocalDate,
        r.getDouble(3)))
    val maxD = evs.map(_._3).max((a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b))
    def toD(s: BigInt): Double = {
      val lo = s % 1000000000L
      val hi = (s - lo) / 1000000000L
      hi.toDouble * 1.0e9 + lo.toDouble
    }
    val expected = evs.groupBy(e => (e._1, e._2)).map { case (k, es) =>
      var wsum = BigInt(0); var vsum = BigInt(0)
      es.foreach { e =>
        val age = java.time.temporal.ChronoUnit.DAYS.between(e._3, maxD)
        if (age <= 40) {
          val w = BigInt(1) << (40 - age).toInt
          val cents = (BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            * 100).toLongExact
          wsum += w; vsum += w * cents
        }
      }
      k -> ((toD(wsum) / (1L << 40).toDouble, toD(vsum) / (1L << 40).toDouble / 100.0))
    }
    val got = Analytics.decayedCounters(sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (c, v)) =>
      assert(c == expected(k)._1 && v == expected(k)._2, s"decay mismatch at $k")
    }
    // decay actually discriminates: an old event weighs less than a new one
    assert(expected.values.exists(_._1 != 0.0))
  }
  test("retention matrix starts at 1.0 and replays the cohort grid") {
    val rows = graft.operators.Analytics.retentionMatrix(sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, size, active, ret) =>
      assert(off >= 0 && active >= 1 && active <= size)
      assert(math.abs(ret - active.toDouble / size) < 1e-12)
      if (off == 0) assert(ret == 1.0)
    }
    // cohort sizes replay from a driver-side first-day recount
    val evs = sf.events.select(
      org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val first = evs.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = first.values.groupBy(identity).view.mapValues(_.size.toLong)
    rows.groupBy(_._1).foreach { case (day, cells) =>
      assert(cells.head._3 == sizes(day), s"cohort $day size")
    }
  }

  test("stickiness lands in (0,1] and replays DAU/WAU") {
    val rows = graft.operators.Analytics.stickiness(sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (nDays, dauSum, wau, st) =>
      assert(nDays >= 1 && nDays <= 7)
      assert(st > 0.0 && st <= 1.0 + 1e-12)
      assert(math.abs(st - (dauSum.toDouble / nDays) / wau) < 1e-12)
    }
  }
  test("churn replays week-over-week membership loss") {
    val rows = graft.operators.Analytics.churn(sf).collect()
      .map(r => (r.getTimestamp(0).toInstant, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val m = sf.events.select(
        org.apache.spark.sql.functions.date_trunc("week",
          org.apache.spark.sql.functions.col("ts")).as("w"),
        org.apache.spark.sql.functions.col("user_id"))
      .distinct().collect()
      .map(r => (r.getTimestamp(0).toInstant, r.getLong(1)))
    val byWeek = m.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val weeks = byWeek.keys.toSeq.sortBy(_.toEpochMilli)
    assert(rows.length == weeks.length - 1)
    rows.foreach { case (w, nActive, nChurned, rate) =>
      val idx = weeks.indexOf(w)
      val (cur, nxt) = (byWeek(weeks(idx)), byWeek(weeks(idx + 1)))
      assert(nActive == cur.size)
      assert(nChurned == (cur -- nxt).size, s"week $w")
      assert(math.abs(rate - nChurned.toDouble / nActive) < 1e-12)
    }
  }

  test("cumulative reach: final value = total distinct users, first-seen replay") {
    val rows = graft.operators.Analytics.cumulativeReach(sf).collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val totalUsers = sf.events.select("user_id").distinct().count()
    assert(rows.last._4 == totalUsers)
    // monotone reach; actives never exceed reach-to-date
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._4 == a._4 + b._2)
      case _ =>
    }
    rows.foreach { case (_, nu, au, cum) =>
      assert(au >= nu && cum >= au)
    }
    assert(rows.map(_._2).sum == totalUsers)
  }

  test("flow matrix: per-step totals are bounded by journey counts and sum to markov totals over shared steps") {
    val rows = graft.operators.Analytics.flowMatrix(sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 >= 1 && r._1 <= 5))
    // step s transitions can't exceed users with > s events
    val perUser = sf.events.groupBy("user_id").count().collect()
      .map(r => r.getLong(1))
    (1 to 5).foreach { s =>
      val n = rows.filter(_._1 == s).map(_._4).sum
      assert(n == perUser.count(_ > s), s"step $s total")
    }
  }

  test("sequential pattern support matches an in-memory any-distance replay") {
    val rows = graft.operators.Analytics.sequentialPairs(sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.nonEmpty)
    val events = sf.events.select("user_id", "event_type", "ts").collect()
      .map { r =>
        // micros, not millis — a strict < on truncated millis could
        // disagree with the operator's full-precision comparison
        val t = r.get(2) match {
          case ldt: java.time.LocalDateTime =>
            val x = java.sql.Timestamp.valueOf(ldt)
            x.getTime * 1000 + (x.getNanos % 1000000) / 1000
          case ts: java.sql.Timestamp =>
            ts.getTime * 1000 + (ts.getNanos % 1000000) / 1000
        }
        (r.getLong(0), r.getString(1), t)
      }
    val users = events.map(_._1).distinct
    val types = events.map(_._2).distinct
    val exp = (for {
      a <- types; b <- types if a != b
      n = users.count { u =>
        val ue = events.filter(_._1 == u)
        val as = ue.filter(_._2 == a).map(_._3)
        val bs = ue.filter(_._2 == b).map(_._3)
        as.nonEmpty && bs.nonEmpty && as.min < bs.max
      } if n > 0
    } yield (a, b) -> n.toLong).toMap
    assert(rows.keySet == exp.keySet)
    exp.foreach { case (k, n) =>
      assert(rows(k)._1 == n, s"pair $k")
      assert(math.abs(rows(k)._2 - n.toDouble / users.length) < 1e-12)
    }
  }
}
