package graft

import graft.operators.Relational10

class Relational10Spec extends SparkSpec {

  test("audience overlap replays exact set arithmetic per type pair") {
    val rows = Relational10.audienceOverlap(sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(rows.nonEmpty)
    val m = sf.events.select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = m.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = byType.keys.toSeq.sorted
    // every unordered pair with a nonempty intersection is present
    for (a <- types; b <- types if a < b) {
      val (sa, sb) = (byType(a), byType(b))
      val inter = (sa & sb).size.toLong
      rows.get((a, b)) match {
        case Some((na, nb, nBoth, j)) =>
          assert(na == sa.size && nb == sb.size && nBoth == inter)
          assert(math.abs(j - inter.toDouble / (sa ++ sb).size) < 1e-12)
        case None => assert(inter == 0, s"missing pair ($a,$b)")
      }
    }
  }

  test("dup payments pairs stay inside their blocking group and window") {
    val rows = Relational10.dupPayments(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val orders = sf.orders.select("o_orderkey", "o_custkey", "o_totalprice")
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact)).toMap
    rows.foreach { case (cust, a, b, ca, cb, days) =>
      assert(a < b)
      assert(days >= 0 && days <= 90)
      val (custA, centsA) = orders(a)
      val (custB, centsB) = orders(b)
      assert(custA == cust && custB == cust)
      assert(ca == centsA && cb == centsB)
      // same 20k-dollar bucket
      assert(centsA / 2000000L == centsB / 2000000L)
    }
  }
  test("did replays the four-cell conditional sums per nation") {
    val rows = Relational10.didPromoImpact(sf).collect()
    assert(rows.nonEmpty)
    val li = sf.lineitem
    val promo = sf.part.collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        r.getAs[String]("p_type").startsWith("PROMO")).toMap
    val sup = sf.supplier.collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("s_nationkey")).toMap
    val nat = sf.nation.collect()
      .map(r => r.getAs[Long]("n_nationkey") -> r.getAs[String]("n_name")).toMap
    val cells = scala.collection.mutable.Map[(String, Boolean, Boolean), BigInt]()
      .withDefaultValue(BigInt(0))
    li.select("l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice",
        "l_discount").collect().foreach { r =>
      val nation = nat(sup(r.getLong(1)))
      val treated = promo(r.getLong(0))
      val shipDay = r.get(2) match {
        case ldt: java.time.LocalDateTime => ldt.toLocalDate
        case ts: java.sql.Timestamp      => ts.toLocalDateTime.toLocalDate
        case d: java.sql.Date            => d.toLocalDate
      }
      val post = !shipDay.isBefore(java.time.LocalDate.parse("1998-01-01"))
      val micros = (BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        (BigDecimal(1) - BigDecimal(r.getDouble(4))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)) * 1000000).toBigIntExact.get
      cells((nation, treated, post)) += micros
    }
    rows.foreach { r =>
      val n = r.getString(0)
      def bd(i: Int) = BigInt(r.getLong(i))
      assert(bd(1) == cells((n, true, false)), s"$n t_pre")
      assert(bd(2) == cells((n, true, true)), s"$n t_post")
      assert(bd(3) == cells((n, false, false)), s"$n c_pre")
      assert(bd(4) == cells((n, false, true)), s"$n c_post")
      assert(bd(5) == bd(2) - bd(1) - (bd(4) - bd(3)))
    }
  }
  test("top movers uses a TakeOrdered cut and real consecutive-month lags") {
    val df = Relational10.topMovers(sf)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        BigInt(r.getLong(2)), BigInt(r.getLong(3)), BigInt(r.getLong(4))))
    assert(rows.length == 20)
    rows.foreach { case (_, _, prev, cur, ch) => assert(ch == cur - prev) }
    // ordering is abs-change desc with deterministic tie-breaks
    val key = rows.map { case (p, m, _, _, ch) => (-ch.abs, p, m.toEpochDay) }
    assert(key.sameElements(key.sorted))
    // the global cut plans as TakeOrdered, not a full sort + limit
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }
  test("gap histogram buckets partition all per-user gaps with exact shares") {
    val rows = Relational10.gapHistogram(sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val totalGaps = rows.map(_._2).sum
    // per-user gap count = events - users (one lag dropped per user)
    val nEvents = sf.events.count()
    val nUsers = sf.events.select("user_id").distinct().count()
    assert(totalGaps == nEvents - nUsers)
    // buckets ordered, shares sum to 1, cumulative ends at 1
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(rows.last._4 - 1.0) < 1e-9)
    rows.foreach { case (_, n, share, _) =>
      assert(math.abs(share - n.toDouble / totalGaps) < 1e-12) }
  }
  test("cycle time percentiles replay the exact type-1 cut per cell") {
    val rows = Relational10.cycleTime(sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions.col
    val j = sf.lineitem
      .join(sf.orders, col("l_orderkey") === col("o_orderkey"))
      .select("o_orderkey", "o_orderpriority", "o_orderdate", "l_shipdate")
      .collect().map { r =>
        def day(i: Int) = r.get(i) match {
          case ldt: java.time.LocalDateTime => ldt.toLocalDate
          case ts: java.sql.Timestamp      => ts.toLocalDateTime.toLocalDate
          case d: java.sql.Date            => d.toLocalDate
        }
        (r.getLong(0), r.getString(1), day(2), day(3))
      }
    val s1 = j.map { case (_, p, od, sd) =>
      (p, "order_to_ship", sd.toEpochDay - od.toEpochDay) }
    val s2 = j.groupBy(x => (x._1, x._2)).map { case ((_, p), ls) =>
      val days = ls.map(_._4.toEpochDay)
      (p, "ship_spread", days.max - days.min) }
    (s1 ++ s2).groupBy(x => (x._1, x._2)).foreach { case (key, vsRaw) =>
      val vs = vsRaw.map(_._3).toSeq.sorted
      val (n, p50, p90) = rows(key)
      assert(n == vs.size)
      assert(p50 == vs((vs.size + 1) / 2 - 1), s"$key p50")
      assert(p90 == vs((9 * vs.size + 9) / 10 - 1), s"$key p90")
    }
  }
  test("supplier scorecard replays volume, returns, and latency sums") {
    import org.apache.spark.sql.functions.col
    val rows = Relational10.supplierScorecard(sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        BigInt(r.getLong(3)), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(rows.nonEmpty)
    val byOrder = sf.orders.select("o_orderkey", "o_orderdate").collect()
      .map { r =>
        val d = r.get(1) match {
          case ldt: java.time.LocalDateTime => ldt.toLocalDate
          case ts: java.sql.Timestamp      => ts.toLocalDateTime.toLocalDate
          case d: java.sql.Date            => d.toLocalDate
        }
        r.getLong(0) -> d
      }.toMap
    val lines = sf.lineitem
      .select("l_orderkey", "l_suppkey", "l_returnflag", "l_shipdate")
      .collect().map { r =>
        val sd = r.get(3) match {
          case ldt: java.time.LocalDateTime => ldt.toLocalDate
          case ts: java.sql.Timestamp      => ts.toLocalDateTime.toLocalDate
          case d: java.sql.Date            => d.toLocalDate
        }
        (r.getLong(1), r.getString(2),
          sd.toEpochDay - byOrder(r.getLong(0)).toEpochDay)
      }
    lines.groupBy(_._1).foreach { case (supp, ls) =>
      val (_, n, _, rr, msd) = rows(supp)
      assert(n == ls.length)
      assert(math.abs(rr - ls.count(_._2 == "R").toDouble / n) < 1e-12)
      assert(math.abs(msd - ls.map(_._3).sum.toDouble / n) < 1e-12)
    }
  }

  test("price/volume bridge is additive and matches year totals") {
    import org.apache.spark.sql.functions._
    val rows = Relational10.priceVolumeBridge(sf).collect()
    assert(rows.nonEmpty)
    // per brand: rev1 + volume + price + new - lost == rev2 EXACTLY
    rows.foreach { r =>
      val Seq(r1, vol, prc, nw, lost, r2) = (1 to 6).map(r.getLong)
      assert(r1 + vol + prc + nw - lost == r2, s"bridge not additive: $r")
    }
    // grand totals match an independent per-year revenue aggregation
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val byYear = sf.lineitem
      .where(year(col("l_shipdate")).isin(1996, 1997))
      .groupBy(year(col("l_shipdate")).as("yr"))
      .agg(sum((graft.functions.Exact.discPrice(
        col("l_extendedprice"), col("l_discount")) * lit(1000000))
        .cast(d38)).cast("long").as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getLong(1)).sum == byYear(1996))
    assert(rows.map(_.getLong(6)).sum == byYear(1997))
  }
}
