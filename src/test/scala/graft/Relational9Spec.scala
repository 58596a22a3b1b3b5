package graft

import graft.operators.Relational9

class Relational9Spec extends SparkSpec {

  /** Exact per-key revenue micros replayed on the driver. */
  private def microsBy[K](rows: Seq[(K, Double, Double)]): Map[K, Long] =
    rows.groupBy(_._1).view.mapValues { rs =>
      rs.map { case (_, price, disc) =>
        (BigDecimal(price).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
          (BigDecimal(1) - BigDecimal(disc)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP)) * 1000000)
      }.sum.toLongExact
    }.toMap

  private def dailySeries: Seq[(Long, Long)] = {
    val rows = sf.lineitem
      .select("l_shipdate", "l_extendedprice", "l_discount").collect()
      .map { r =>
        val d = (r.get(0) match {
          case t: java.sql.Timestamp => t.toLocalDateTime
          case t: java.time.LocalDateTime => t
        }).toLocalDate.toEpochDay
        (d, r.getDouble(1), r.getDouble(2))
      }.toSeq
    microsBy(rows).toSeq.sortBy(_._1)
  }

  test("ordinal patterns: counts equal a driver triple scan, patterns valid") {
    val series = dailySeries.map(_._2)
    val expect = series.sliding(3).filter(_.size == 3).map { w =>
      val Seq(v1, v2, v3) = w
      val r1 = (if (v2 < v1) 1 else 0) + (if (v3 < v1) 1 else 0)
      val r2 = (if (v1 <= v2) 1 else 0) + (if (v3 < v2) 1 else 0)
      val r3 = (if (v1 <= v3) 1 else 0) + (if (v2 <= v3) 1 else 0)
      s"$r1$r2$r3"
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Relational9.ordinalPatterns(sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // every pattern is a permutation of 012
    got.keys.foreach(p => assert(p.sorted == "012", s"bad pattern $p"))
    assert(got.values.sum == (series.size - 2).toLong)
  }

  test("weighted median: half the money sits at or below the reported size") {
    val brands = sf.part.select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    val li = sf.lineitem
      .select("l_partkey", "l_extendedprice", "l_discount").collect()
      .map(r => (brands(r.getLong(0)), r.getDouble(1), r.getDouble(2))).toSeq
    val byBrandSize = microsBy(li)
    val got = Relational9.weightedMedian(sf).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    byBrandSize.keys.map(_._1).toSeq.distinct.foreach { b =>
      val sizes = byBrandSize.collect { case ((`b`, s), u) => (s, u) }
        .toSeq.sortBy(_._1)
      val total = sizes.map(_._2).sum
      val cum = sizes.scanLeft(0L)(_ + _._2).tail
      val med = sizes.zip(cum).find { case (_, c) => 2 * c >= total }.get._1._1
      val (gotMed, gotTotal) = got(b)
      assert(gotMed == med, s"brand $b")
      assert(gotTotal == total, s"brand $b total")
    }
  }

  test("equi-depth histogram: balanced bucket counts, ordered bounds, shares sum to 1") {
    val rows = Relational9.equidepthHist(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val counts = rows.map(_._2)
    assert(counts.max - counts.min <= 1, s"unbalanced: ${counts.toSeq}")
    // bucket value ranges are ordered and non-overlapping
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, s"overlap ${a._1}->${b._1}")
      case _ =>
    }
    assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-12)
    // total part count matches the distinct part count in the fact table
    val nParts = sf.lineitem.select("l_partkey").distinct().count()
    assert(counts.sum == nParts)
  }

  test("ref integrity reports all 7 edges with zero orphans on clean data") {
    val rows = Relational9.refIntegrity(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 7)
    // synthetic star schema is referentially clean
    rows.foreach { case (e, n, o) =>
      assert(n > 0, s"$e has no rows")
      assert(o == 0L, s"$e has $o orphans")
    }
    val byEdge = rows.map(r => r._1 -> r._2).toMap
    assert(byEdge("lineitem.l_partkey->part") == sf.lineitem.count())
    assert(byEdge("orders.o_custkey->customer") == sf.orders.count())
    assert(byEdge("nation.n_regionkey->region") == sf.nation.count())
    // a planted orphan IS caught
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ri").toString
    sf.nation.write.parquet(s"$dir/nation.parquet")
    sf.region.where(col("r_regionkey") =!= 0)
      .write.parquet(s"$dir/region.parquet")
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem"))
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .write.parquet(s"$dir/$t.parquet")
    val planted = Relational9.refIntegrity(Tables(spark, dir)).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(planted("nation.n_regionkey->region") > 0L)
  }

  test("concurrency peak matches a driver sweep-line over the same sessions") {
    val row = Relational9.concurrencyPeak(sf).collect().head
    val (nSess, peak, peakTs) =
      (row.getLong(0), row.getLong(1), row.getTimestamp(2))
    // rebuild sessions with the shared 30-min-gap rule
    val evs = sf.events.select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val sessions = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._2)
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = sorted.head
      var prev = sorted.head
      sorted.tail.foreach { t =>
        if (t - prev > 1800000L) { bounds += ((start, prev)); start = t }
        prev = t
      }
      bounds += ((start, prev))
      bounds
    }.toSeq
    assert(nSess == sessions.size.toLong)
    val deltas = sessions.flatMap { case (s, e) => Seq((s, 1), (e, -1)) }
      .sortBy { case (ts, d) => (ts, -d) }
    var conc = 0L
    var best = (0L, Long.MaxValue)
    deltas.foreach { case (ts, d) =>
      conc += d
      if (conc > best._1) best = (conc, ts)
    }
    assert(peak == best._1, s"peak $peak vs ${best._1}")
    assert(peakTs.getTime == best._2,
      s"peak ts ${peakTs.getTime} vs ${best._2}")
  }

  test("date spine gap accounting matches a driver calendar replay") {
    val brands = sf.part.select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val days = sf.lineitem.select("l_partkey", "l_shipdate").collect()
      .map { r =>
        val d = (r.get(1) match {
          case t: java.sql.Timestamp => t.toLocalDateTime
          case t: java.time.LocalDateTime => t
        }).toLocalDate.toEpochDay
        (brands(r.getLong(0)), d)
      }.toSet
    val got = Relational9.dateSpine(sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    days.map(_._1).foreach { b =>
      val active = days.collect { case (`b`, d) => d }
      val (d0, d1) = (active.min, active.max)
      val span = (d0 to d1).toSeq
      val gaps = span.filterNot(active)
      // longest consecutive gap run
      var best = 0L; var cur = 0L; var prev = Long.MinValue
      gaps.sorted.foreach { d =>
        cur = if (d == prev + 1) cur + 1 else 1
        best = math.max(best, cur); prev = d
      }
      assert(got(b) == ((span.size.toLong, active.size.toLong,
        gaps.size.toLong, best)), s"brand $b: ${got(b)}")
    }
  }

  test("order aging buckets match a driver replay and cover all open orders") {
    val rows = Relational9.orderAging(sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    val orders = sf.orders
      .select("o_orderstatus", "o_orderdate", "o_totalprice").collect()
      .map { r =>
        val d = (r.get(1) match {
          case t: java.sql.Timestamp => t.toLocalDateTime
          case t: java.time.LocalDateTime => t
        }).toLocalDate.toEpochDay
        (r.getString(0), d, r.getDouble(2))
      }
    val end = orders.map(_._2).max
    val open = orders.filter(_._1 != "F")
    def band(age: Long) =
      if (age <= 30) "00-30" else if (age <= 60) "31-60"
      else if (age <= 90) "61-90" else "90+"
    val expect = open.groupBy { case (s, d, _) => (s, band(end - d)) }
      .map { case (k, g) =>
        k -> ((g.length.toLong,
          g.map(x => BigDecimal(x._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble,
          g.map(x => end - x._2).min, g.map(x => end - x._2).max))
      }
    assert(rows == expect)
    assert(rows.values.map(_._1).sum == open.length.toLong)
    assert(!rows.keySet.exists(_._1 == "F"))
  }

  test("quantile sketch audit: exact ranks replay, estimates bounded by one bucket width") {
    val rows = graft.operators.Relational9.quantileSketchAudit(sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(10, 25, 50, 75, 90, 99))
    val cents = sf.lineitem
      .selectExpr(
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS LONG) AS c")
      .collect().map(_.getLong(0)).sorted
    val n = cents.length
    val width = (cents.last - cents.head) / 256 + 1
    rows.foreach { case (pct, exact, est, err, frac) =>
      val tgt = ((n - 1).toLong * pct) / 100
      assert(exact == cents(tgt.toInt), s"p$pct exact")
      assert(err == math.abs(est - exact), s"p$pct err")
      // interpolation can't leave the bucket the rank falls in
      assert(err <= width, s"p$pct: err $err exceeds bucket width $width")
      assert(math.abs(frac - err.toDouble / exact) < 1e-12)
    }
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
