package graft

import graft.operators.Relational8

class Relational8Spec extends SparkSpec {

  test("hhi matches a driver-side share-squared replay per nation") {
    val rows = Relational8.hhi(sf).collect()
    assert(rows.nonEmpty)
    // replay: exact per-supplier revenue micros -> shares -> sum of squares
    val li = sf.lineitem
    val sup = sf.supplier
    val nat = sf.nation
    val perSupp = li
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(nat, sup("s_nationkey") === nat("n_nationkey"))
      .select("n_name", "s_suppkey", "l_extendedprice", "l_discount")
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .view.mapValues { rs =>
        rs.map { r =>
          (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
            (BigDecimal(1) - BigDecimal(r.getDouble(3))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP))).setScale(6)
        }.sum
      }.toMap
    val byNation = perSupp.groupBy(_._1._1).view.mapValues(_.values.toSeq).toMap
    rows.foreach { r =>
      val (nation, n, hhi) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val revs = byNation(nation)
      assert(n == revs.size)
      val tot = revs.sum
      val expect = revs.map(v => (v / tot).toDouble).map(s => s * s).sum
      assert(math.abs(hhi - expect) < 1e-9, s"$nation: $hhi vs $expect")
      // HHI lives in (1/n, 1]
      assert(hhi > 1.0 / n - 1e-12 && hhi <= 1.0 + 1e-12)
    }
  }

  test("autocorr reports lags 1..7 with |acf| <= 1 and exact pair counts") {
    val rows = Relational8.autocorr(sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 7L))
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12)
    }
    // pair count replay: days present at both d and d+k
    val days = sf.lineitem.select(col("l_shipdate").cast("date"))
      .distinct().collect()
      .map(_.getDate(0).toLocalDate.toEpochDay).toSet
    rows.foreach { r =>
      val k = r.getLong(0)
      val expectN = days.count(d => days.contains(d + k)).toLong
      assert(r.getLong(1) == expectN, s"lag $k")
    }
  }

  test("cusum matches an exact integer recurrence replay over the day series") {
    val row = Relational8.cusum(sf).collect().head
    val (n, mu, mx, arg) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // replay: exact decimal daily revenue -> micros -> integer CUSUM
    val daily = sf.lineitem
      .select("l_shipdate", "l_extendedprice", "l_discount").collect()
      .groupBy { r =>
        (r.get(0) match {
          case t: java.sql.Timestamp => t.toLocalDateTime
          case t: java.time.LocalDateTime => t
        }).toLocalDate.toEpochDay
      }
      .view.mapValues { rs =>
        rs.map { r =>
          (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
            (BigDecimal(1) - BigDecimal(r.getDouble(2))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
        }.sum
      }.toMap
      .map { case (d, rev) => d -> (rev * 1000000).toLongExact }
    val series = daily.toSeq.sortBy(_._1)
    assert(n == series.size.toLong)
    val emu = series.map(_._2).sum / series.size
    assert(mu == emu)
    var s = 0L; var emx = 0L; var earg = -1L
    series.foreach { case (d, v) =>
      s = math.max(0L, s + (v - emu))
      if (s > emx) { emx = s; earg = d }
    }
    assert(mx == emx && arg == earg)
  }

  test("runs test counts sign runs exactly and z matches the closed form") {
    val row = Relational8.runsTest(sf).collect().head
    val (n, np, nm, r) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(n == np + nm)
    assert(r >= 1 && r <= n)
    val p = np * nm
    val eExp = 1 + (2.0 * p) / n
    assert(row.getDouble(4) == eExp)
    val vr = ((2 * p) * (2 * p - n)).toDouble / (n * n).toDouble / (n - 1).toDouble
    assert(row.getDouble(5) == (r.toDouble - eExp) / math.sqrt(vr))
    // recount runs from the exact daily series
    val daily = sf.lineitem
      .select("l_shipdate", "l_extendedprice", "l_discount").collect()
      .groupBy { rr =>
        (rr.get(0) match {
          case t: java.sql.Timestamp => t.toLocalDateTime
          case t: java.time.LocalDateTime => t
        }).toLocalDate.toEpochDay
      }
      .view.mapValues { rs =>
        rs.map { rr =>
          (BigDecimal(rr.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
            (BigDecimal(1) - BigDecimal(rr.getDouble(2))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
        }.sum
      }.toMap
      .map { case (d, rev) => d -> (rev * 1000000).toLongExact }
    val series = daily.toSeq.sortBy(_._1).map(_._2)
    val mu = series.sum / series.size
    val ups = series.map(_ > mu)
    assert(np == ups.count(identity).toLong && nm == ups.count(!_).toLong)
    val runs = 1 + ups.zip(ups.tail).count { case (a, b) => a != b }
    assert(r == runs.toLong)
  }

  test("gini matches the sorted-rank closed form per nation and lands in [0,1)") {
    val rows = Relational8.gini(sf).collect()
    assert(rows.nonEmpty)
    val li = sf.lineitem
    val sup = sf.supplier
    val nat = sf.nation
    val perSupp = li
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(nat, sup("s_nationkey") === nat("n_nationkey"))
      .select("n_name", "s_suppkey", "l_extendedprice", "l_discount")
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .view.mapValues { rs =>
        rs.map { r =>
          (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
            (BigDecimal(1) - BigDecimal(r.getDouble(3))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP)) * 1000000)
        }.sum.toLongExact
      }.toMap
    rows.foreach { r =>
      val (nation, n, g) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val xs = perSupp.collect { case ((nm, sk), u) if nm == nation => (u, sk) }
        .toSeq.sortBy { case (u, sk) => (u, sk) }.map(_._1)
      assert(n == xs.size)
      val sx = xs.map(BigInt(_)).sum
      val srx = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val expect = 2.0 * srx.toDouble / (n * sx.toDouble) - (n + 1.0) / n
      assert(math.abs(g - expect) < 1e-9, s"$nation: $g vs $expect")
      assert(g >= 0.0 - 1e-12 && g < 1.0)
    }
  }

  test("chi square matches an exact contingency replay") {
    val row = Relational8.chiSquare(sf).collect().head
    val (n, nCells, dof, chi2) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    val evs = sf.events.select("event_type", "ts").collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toLocalDateTime.toLocalDate.toEpochDay % 7))
    val cells = evs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(n == evs.length.toLong && nCells == cells.size.toLong)
    val rt = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    assert(dof == (rt.size - 1).toLong * (ct.size - 1))
    val terms = cells.toSeq.sortBy(_._1).map { case ((typ, dow), o) =>
      val e = (rt(typ) * ct(dow)).toDouble / n
      (o.toDouble - e) * (o.toDouble - e) / e
    }
    val expect = terms.tail.foldLeft(terms.head)(_ + _)
    assert(chi2 == expect, s"$chi2 vs $expect")
  }

  test("ks test matches an exact integer CDF-gap replay") {
    val row = Relational8.ksTest(sf).collect().head
    val (n1, n2, dNum, atUnits, ks) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getDouble(4))
    val types = sf.part.select("p_partkey", "p_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perPart = sf.lineitem
      .select("l_partkey", "l_extendedprice", "l_discount").collect()
      .groupBy(_.getLong(0))
      .view.mapValues { rs =>
        rs.map { r =>
          (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
            (BigDecimal(1) - BigDecimal(r.getDouble(2))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP)) * 1000000)
        }.sum.toLongExact
      }.toMap
    val groups = perPart.toSeq.map { case (pk, u) =>
      (u, types(pk) == "PROMO")
    }
    val (en1, en2) = (groups.count(_._2).toLong, groups.count(!_._2).toLong)
    assert(n1 == en1 && n2 == en2)
    val byValue = groups.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (u, g) => (u, g.count(_._2).toLong, g.count(!_._2).toLong) }
    var (c1, c2) = (0L, 0L)
    var best = (-1L, Long.MaxValue) // (diff, units) with smallest-units tie
    byValue.foreach { case (u, a, b) =>
      c1 += a; c2 += b
      val diff = math.abs(c1 * en2 - c2 * en1)
      if (diff > best._1) best = (diff, u)
    }
    assert(dNum == best._1 && atUnits == best._2)
    assert(ks == dNum.toDouble / (en1 * en2).toDouble)
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("mann-whitney u2 equals the doubled tie-averaged rank-sum replay") {
    val row = Relational8.mannWhitney(sf).collect().head
    val (n1, n2, u2, z) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    val types = sf.part.select("p_partkey", "p_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perPart = sf.lineitem
      .select("l_partkey", "l_extendedprice", "l_discount").collect()
      .groupBy(_.getLong(0))
      .view.mapValues { rs =>
        rs.map { r =>
          (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
            (BigDecimal(1) - BigDecimal(r.getDouble(2))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP)) * 1000000)
        }.sum.toLongExact
      }.toMap
    val vals = perPart.toSeq.map { case (pk, u) => (u, types(pk) == "PROMO") }
      .sortBy(_._1)
    assert(n1 == vals.count(_._2).toLong && n2 == vals.count(!_._2).toLong)
    // doubled tie-averaged rank sum for the promo group
    var s = 0L
    var sum2r1 = 0L
    vals.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
      val c = g.size.toLong
      val a = g.count(_._2).toLong
      sum2r1 += a * (2 * s + c + 1)
      s += c
    }
    val expU2 = sum2r1 - n1 * (n1 + 1)
    assert(u2 == expU2)
    val expZ = ((sum2r1 - n1 * (n1 + 1)).toDouble / 2 - (n1 * n2).toDouble / 2) /
      math.sqrt((n1 * n2).toDouble * (n1 + n2 + 1).toDouble / 12)
    assert(z == expZ)
    // cross-check against a direct pair count: U = #(promo > other) + ties/2
    val promo = vals.filter(_._2).map(_._1)
    val other = vals.filter(!_._2).map(_._1)
    val wins2 = promo.map(p =>
      2L * other.count(_ < p) + other.count(_ == p)).sum
    assert(u2 == wins2)
  }

  test("lorenz deciles partition each nation's suppliers and cum_share ends at 1") {
    val rows = Relational8.lorenz(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val suppPerNation = sf.supplier
      .join(sf.lineitem.select("l_suppkey").distinct(),
        col("s_suppkey") === col("l_suppkey"))
      .join(sf.nation, col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (nation, ds) =>
      val sorted = ds.sortBy(_._2)
      // deciles are 1..10 (each nonempty once any supplier lands in it),
      // their populations partition the nation's revenue-bearing suppliers
      assert(sorted.map(_._2).toSeq == sorted.map(_._2).toSeq.sorted)
      assert(sorted.forall(d => d._2 >= 1 && d._2 <= 10))
      assert(sorted.map(_._3).sum == suppPerNation(nation))
      // decile shares sum to 1; cumulative share is monotone, ends at 1
      assert(math.abs(sorted.map(_._4).sum - 1.0) < 1e-9)
      val cums = sorted.map(_._5)
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a - 1e-12 })
      assert(math.abs(cums.last - 1.0) < 1e-9)
      // Lorenz curve is convex-ish: cum share at decile d <= d/10 + eps
      sorted.foreach { case (_, d, _, _, c) =>
        assert(c <= d / 10.0 + 1e-9, s"$nation d$d cum $c above diagonal")
      }
    }
  }

  test("mk trend replays the exact pairwise S and tie-corrected variance") {
    val rows = Relational8.mkTrend(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(rows.nonEmpty)
    // exact monthly micros per nation, driver-side
    val monthly = sf.lineitem
      .join(sf.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(sf.nation, col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("l_shipdate").cast("date").as("d"),
        col("l_extendedprice"), col("l_discount"))
      .collect()
      .groupBy(r => (r.getString(0), r.getDate(1).toLocalDate.withDayOfMonth(1)))
      .view.mapValues { rs =>
        rs.map { r =>
          (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
            (BigDecimal(1) - BigDecimal(r.getDouble(3))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP)) * 1000000)
        }.sum.toBigIntExact.get
      }.toMap
    rows.foreach { case (nation, nMonths, s, var18, trend) =>
      val series = monthly.collect { case ((nm, mo), u) if nm == nation => (mo, u) }
        .toSeq.sortBy(_._1.toEpochDay)
      assert(nMonths == series.size)
      val vals = series.map(_._2)
      val expS = (for {
        i <- vals.indices; j <- (i + 1) until vals.size
      } yield (vals(j) compare vals(i)).sign).sum.toLong
      assert(s == expS, s"$nation S $s vs $expS")
      val n = vals.size.toLong
      val ties = vals.groupBy(identity).values.map(_.size.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      assert(var18 == n * (n - 1) * (2 * n + 5) - ties)
      assert(trend == (if (s > 0) "increasing" else if (s < 0) "decreasing" else "none"))
    }
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
