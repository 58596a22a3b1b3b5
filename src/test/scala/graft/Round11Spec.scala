package graft

import graft.operators.{Curation, Graph, Relational7, Relational9, TimeSeries}

/** Specs for the round-11 widening batch: robust trend, bands, ABC/XYZ,
  * winsorized means, contamination report, structural node similarity.
  */
class Round11Spec extends SparkSpec {

  test("forecast backtest: halving fold replays from the daily series") {
    val rows = TimeSeries.forecastBacktest(sf).collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val daily = sf.lineitem
      .groupBy(org.apache.spark.sql.functions.expr("CAST(l_shipdate AS DATE)").as("d"))
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4)) * 1000000 AS DECIMAL(19,0))) AS LONG)").as("v"))
      .collect().map(x => (x.get(0).toString, x.getLong(1))).sortBy(_._1)
    assert(rows.length == daily.length - 8)
    val byDay = daily.zipWithIndex.map { case ((d, _), i) => d -> i }.toMap
    rows.foreach { case (d, actual, forecast, err, ape) =>
      val i = byDay(d)
      assert(actual == daily(i)._2, s"$d actual")
      val exp = daily.slice(i - 8, i).map(_._2).reduce((a, x) => (a + x) / 2)
      assert(forecast == exp, s"$d forecast")
      assert(err == math.abs(actual - forecast))
      assert(ape == err * 1000000L / actual)
    }
  }

  test("theil-sen: slope/intercept are the exact lower medians of the replay") {
    val r = TimeSeries.theilSen(sf).collect()
    assert(r.length == 1)
    val (nDays, nPairs, slope, intercept) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    // replay in memory from the same daily series
    val daily = sf.lineitem
      .groupBy(org.apache.spark.sql.functions.expr("CAST(l_shipdate AS DATE)").as("d"))
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) * 1000000 AS LONG)").as("v"))
      .selectExpr("CAST(datediff(d, DATE '1970-01-01') AS LONG) AS ed", "v")
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    assert(nDays == daily.length)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield Math.floorDiv(daily(j)._2 - daily(i)._2, daily(j)._1 - daily(i)._1))
      .sorted
    assert(nPairs == slopes.length)
    assert(slope == slopes(((slopes.length + 1) / 2 - 1).toInt))
    val res = daily.map { case (d, v) => v - slope * d }.sorted
    assert(intercept == res(((res.length + 1) / 2 - 1).toInt))
  }

  test("bollinger: bands replay the trailing integer stats, breakouts flagged") {
    val rows = TimeSeries.bollinger(sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    val cents = rows.map(_._1)
    rows.zipWithIndex.foreach { case ((c, n, mu, lo, hi, brk), i) =>
      val win = cents.slice(math.max(0, i - 6), i + 1)
      assert(n == win.length)
      val s1 = win.sum; val s2 = win.map(x => x * x).sum
      assert(mu == s1 / n)
      val sd = math.floor(math.sqrt(((n * s2 - s1 * s1) / (n * n)).toDouble)).toLong
      assert(lo == mu - 2 * sd && hi == mu + 2 * sd)
      assert(brk == (c < lo || c > hi))
    }
    // the band must actually fire somewhere at this SF
    assert(rows.exists(_._6) && rows.exists(!_._6))
  }

  test("abc/xyz: classes cover the matrix and part counts reconcile") {
    val rows = Relational7.abcXyz(sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._3).sum ==
      sf.lineitem.select("l_partkey").distinct().count())
    assert(rows.forall { case (a, x, n, rev) =>
      Set("A", "B", "C")(a) && Set("X", "Y", "Z")(x) && n > 0 && rev > 0.0
    })
    // both axes must discriminate at this SF
    assert(rows.map(_._1).distinct.length >= 2)
    assert(rows.map(_._2).distinct.length >= 2)
  }

  test("winsorize: cuts are the histogram percentiles, clamped mean in range") {
    val rows = Relational9.winsorize(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val byId = sf.documents.select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    rows.foreach { case (src, n, p10, p90, wmean, rmean) =>
      val vs = byId(src).map(_._2).sorted
      assert(n == vs.length)
      assert(p10 == vs.find(v => vs.count(_ <= v) * 10 >= vs.length).get)
      assert(p90 == vs.find(v => vs.count(_ <= v) * 10 >= 9 * vs.length).get)
      assert(p10 <= p90)
      val clamped = byId(src).map(x => math.max(p10, math.min(p90, x._2)))
      assert(wmean == clamped.sum.toDouble / clamped.length)
      assert(rmean == vs.sum.toDouble / vs.length)
    }
  }

  test("contamination report is the exact transpose of decontaminate") {
    val rep = Curation.contaminationReport(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // bench docs only, and every bench doc with a leak appears
    assert(rep.forall(_._1 % 97 == 0))
    // transpose check: total (bench, train) contaminated-pair edges agree
    val fromTrain = Curation.decontaminate(sf).collect()
      .map(_.getLong(1)).sum
    assert(rep.map(_._2 > 0).forall(identity))
    val fromBench = rep.map(_._1).distinct.length
    assert(fromBench == rep.length) // one row per compromised bench doc
    assert(fromTrain >= rep.length.toLong) // edges ≥ compromised bench docs
  }

  test("node similarity: jaccard replays from neighbor sets, wedge-complete") {
    val rows = Graph.nodeSimilarity(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, common, j) =>
      assert(a < b && common >= 1 && j >= 0.2 && j <= 1.0)
    }
    // replay the support-2 co-purchase graph in memory (basketPairs'
    // public form uses support 3, the graph tier uses 2)
    val items = sf.lineitem.select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).values.map(_.map(_._2).sorted)
    val support = scala.collection.mutable.Map[(Long, Long), Int]()
    byOrder.foreach { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        support((ps(i), ps(j))) = support.getOrElse((ps(i), ps(j)), 0) + 1
    }
    // iterator first: collect on a Map of pairs would rebuild a Map
    // and collapse same-first-element pairs
    val edges = support.iterator.collect { case (p, c) if c >= 2 => p }.toArray
    val nbrs: Map[Long, Set[Long]] = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    rows.take(10).foreach { case (a, b, common, j) =>
      val (na, nb) = (nbrs(a), nbrs(b))
      assert(common == na.intersect(nb).size,
        s"pair ($a,$b) common=$common replay=${na.intersect(nb).size} na=${na.size} nb=${nb.size}")
      assert(j == na.intersect(nb).size.toDouble / na.union(nb).size)
    }
  }

  test("phash: integer DCT replay, AC median splits the bits near half") {
    val rows = graft.operators.Multimodal.phash(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == sf.documents.count())
    // replay one doc's transform in plain Scala from the shared basis
    val coef = graft.operators.Multimodal.phashCoef
    val id = rows(3)._1
    def lum(x: Int, y: Int): Long =
      299L * ((id + 7L * x + 13L * y) % 256) +
        587L * ((2L * id + 11L * x + 3L * y) % 256) +
        114L * ((3L * id + 5L * x + 17L * y) % 256)
    val tky = Array.tabulate(8, 32)((k, y) =>
      (0 until 32).map(x => lum(x, y) * coef(k)(x)).sum)
    val ac = for { l <- 0 until 8; k <- 0 until 8; if l != 0 || k != 0 }
      yield (l * 8 + k, (0 until 32).map(y => tky(k)(y) * coef(l)(y)).sum)
    val med = ac.map(_._2).sorted.apply((ac.length + 1) / 2 - 1)
    val expect = ac.foldLeft(0L) { case (h, (i, v)) =>
      if (v > med) h | (1L << (i - 1)) else h
    }
    assert(rows(3)._2 == expect)
    // median threshold: 31 of 63 bits set when AC values are distinct
    val setBits = java.lang.Long.bitCount(rows(3)._2)
    assert(setBits >= 25 && setBits <= 31, s"bits=$setBits")
    // hashes discriminate across docs (the stub luma is periodic in
    // doc_id mod 256, so distinct hashes cap at 256 for 500 docs)
    assert(rows.map(_._2).distinct.length > 150)
  }

  test("template shape: buckets, counts, and exemplar reconcile") {
    val rows = graft.operators.TextAnalysis3.templateShape(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (shape, n, _) =>
      assert(n >= 2 && shape.nonEmpty && shape.forall("sml".contains(_)))
    }
    // replay from the raw docs
    val shapes = sf.documents.select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ").take(12)
        (r.getLong(0), ws.map(w =>
          if (w.length <= 3) 's' else if (w.length <= 6) 'm' else 'l').mkString)
      }
    val expect = shapes.groupBy(_._2).collect {
      case (sh, g) if g.length >= 2 => (sh, g.length.toLong, g.map(_._1).min)
    }.toSet
    assert(rows.toSet == expect)
  }

  test("holt-winters: zero-state fold replays, forecast uses the next slot") {
    val r = TimeSeries.holtWinters(sf).collect()
    assert(r.length == 1)
    val (n, level, trend, fc) =
      (r(0).getLong(0), r(0).getDouble(1), r(0).getDouble(2), r(0).getDouble(3))
    // replay the 28-day trailing series fold in plain Scala
    val daily = sf.lineitem
      .groupBy(org.apache.spark.sql.functions.expr("CAST(l_shipdate AS DATE)").as("d"))
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) AS DOUBLE)").as("x"))
      .collect().map(row => (row.getDate(0).toLocalDate, row.getDouble(1)))
      .sortBy(_._1.toEpochDay)
    val mx = daily.map(_._1.toEpochDay).max
    val vals = daily.filter(p => mx - p._1.toEpochDay < 28).map(_._2)
    assert(n == vals.length)
    var l = 0.0; var b = 0.0; val sArr = Array.fill(7)(0.0)
    vals.zipWithIndex.foreach { case (x, i) =>
      val j = i % 7
      val l2 = (x - sArr(j) + l + b) / 2
      val b2 = (l2 - l + b) / 2
      sArr(j) = (x - l2 + sArr(j)) / 2
      l = l2; b = b2
    }
    assert(level == l && trend == b)
    assert(fc == l + b + sArr(vals.length % 7))
  }

  test("cohort ltv: cumulative revenue reconciles and per-member division holds") {
    val rows = graft.operators.Analytics.cohortLtv(sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // cumulative = running sum of revenue within each cohort, and the
    // per-customer curve is monotone nondecreasing
    rows.groupBy(_._1).foreach { case (_, g) =>
      val srt = g.sortBy(_._2)
      var cum = BigDecimal(0)
      srt.foreach { case (_, _, n, rev, cumRev, ltv) =>
        cum += BigDecimal(rev.toString)
        assert(math.abs(cum.toDouble - cumRev) < 1e-6)
        assert(ltv == cumRev / n)
      }
      assert(srt.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
    // total revenue across all cells equals the orders total
    val total = rows.map(r => BigDecimal(r._4.toString)).sum.toDouble
    val expect = sf.orders.agg(org.apache.spark.sql.functions.expr(
      "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)")).head().getDouble(0)
    assert(math.abs(total - expect) < 1e-4)
  }

  test("phash real: decode-resample-DCT replays from the pixel formula") {
    val rows = graft.operators.Multimodal.phashReal(sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(rows.length == sf.documents.count())
    // dims come from the DECODED raster
    rows.foreach { case (id, w, h, _) =>
      assert(w == 8 + (id % 9).toInt && h == 8 + ((id * 3) % 9).toInt)
    }
    // replay one doc fully in scala from the synthesis formula
    val (id, w, h, got) = rows(5)
    def lum(x: Int, y: Int): Long =
      299L * ((id + 7L * x + 13L * y) % 256) +
        587L * ((2L * id + 11L * x + 3L * y) % 256) +
        114L * ((3L * id + 5L * x + 17L * y) % 256)
    val coef = graft.operators.Multimodal.phashRealCoef
    val cells = Array.tabulate(32, 32) { (i, j) =>
      (for {
        x <- 0 until w
        ox = math.min((x + 1) * 32, (i + 1) * w) - math.max(x * 32, i * w)
        if ox > 0
        y <- 0 until h
        oy = math.min((y + 1) * 32, (j + 1) * h) - math.max(y * 32, j * h)
        if oy > 0
      } yield lum(x, y) * ox * oy).sum
    }
    val tky = Array.tabulate(8, 32)((k, j) =>
      (0 until 32).map(i => cells(i)(j) * coef(k)(i)).sum)
    val ac = for { l <- 0 until 8; k <- 0 until 8; if l != 0 || k != 0 }
      yield (l * 8 + k, (0 until 32).map(j => tky(k)(j) * coef(l)(j)).sum)
    val med = ac.map(_._2).sorted.apply((ac.length + 1) / 2 - 1)
    val expect = ac.foldLeft(0L) { case (hh, (i, v)) =>
      if (v > med) hh | (1L << (i - 1)) else hh
    }
    assert(got == expect)
  }

  test("neyman allocation: quotas replay from the integer stats and fill by hash") {
    val rows = graft.operators.Sampling.neymanSample(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val docs = sf.documents.select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val stats = docs.groupBy(_._1).map { case (src, g) =>
      val nh = g.length.toLong
      val s1 = g.map(_._3).sum; val s2 = g.map(x => x._3 * x._3).sum
      val sigma = math.floor(math.sqrt(((nh * s2 - s1 * s1) / (nh * nh)).toDouble)).toLong
      src -> (nh, nh * sigma)
    }
    val wsum = stats.values.map(_._2).sum
    val quotas = stats.map { case (src, (nh, w)) =>
      src -> math.min(nh, 120L * w / wsum)
    }
    // per-stratum counts equal the replayed quota, and quota column agrees
    rows.groupBy(_._1).foreach { case (src, g) =>
      assert(g.length.toLong == quotas(src), s"$src: ${g.length} vs ${quotas(src)}")
      assert(g.forall(_._4 == quotas(src)))
    }
    // allocation favors varied strata: at least two distinct quotas at this SF
    assert(quotas.values.toSeq.distinct.length >= 2)
  }

  test("surrogate keys: dense, stable, single-sorted, no global window exchange") {
    val rows = graft.operators.Etl.surrogateKeys(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(rows.length == sf.part.count())
    // dense 1..N
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    // order follows the business sort key
    val sortedNat = rows.sortBy(r => (r._3, r._4, r._2))
    assert(rows.toSeq == sortedNat.toSeq)
    // reload stability: a second run assigns identical keys
    val again = graft.operators.Etl.surrogateKeys(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(r => (r._1, r._2)).sameElements(again))
    // the rank runs as the two-level form, not one global window
    val plan = graft.operators.Etl.surrogateKeys(sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
  }

  test("price index: base month is 1.0 and valuations replay exactly") {
    val rows = graft.operators.Relational9.priceIndex(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // the base month prices itself at exactly 1.0
    assert(rows.head._3 == 1.0, rows.head.toString)
    // replay a later month's index from raw data
    val pm = sf.lineitem.groupBy(
        org.apache.spark.sql.functions.col("l_partkey"),
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("l_shipdate"), "yyyy-MM").as("ym"))
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 1000000 AS LONG) div SUM(CAST(l_quantity AS LONG))").as("p"),
        org.apache.spark.sql.functions.expr("SUM(CAST(l_quantity AS LONG))").as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ym0 = pm.map(_._2).min
    val basket = pm.filter(_._2 == ym0).map(r => r._1 -> (r._3, r._4)).toMap
    val target = rows(rows.length / 2)._1
    val common = pm.filter(_._2 == target).filter(r => basket.contains(r._1))
    val num = common.map(r => BigInt(r._3) * basket(r._1)._2).sum
    val den = common.map(r => BigInt(basket(r._1)._1) * basket(r._1)._2).sum
    val got = rows.find(_._1 == target).get
    assert(got._2 == common.length)
    assert(math.abs(got._3 - num.toDouble / den.toDouble) < 1e-12)
  }

  test("link predict: RA scores replay, candidates are strictly non-edges") {
    val rows = graft.operators.Graph.linkPredict(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 100)
    // replay the support-2 graph (the node-similarity spec recipe)
    val items = sf.lineitem.select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val support = scala.collection.mutable.Map[(Long, Long), Int]()
    items.groupBy(_._1).values.foreach { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        support((ps(i), ps(j))) = support.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val edges = support.iterator.collect { case (p, c) if c >= 2 => p }.toArray
    val edgeSet = edges.toSet
    val nbrs: Map[Long, Set[Long]] = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    rows.foreach { case (a, b, common, ra) =>
      assert(a < b && !edgeSet((a, b)), s"($a,$b) is an existing edge")
      val shared = nbrs(a).intersect(nbrs(b))
      assert(common == shared.size)
      assert(ra == shared.toSeq.map(w => 1000000L / nbrs(w).size).sum)
    }
    // ranked descending by score
    assert(rows.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("control chart: global limits replay and flags are exact") {
    val rows = graft.operators.TimeSeries.controlChart(sf).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    assert(rows.head._2.isEmpty) // first day has no moving range
    val cents = rows.map(_._1)
    val mrs = cents.sliding(2).map { w => math.abs(w(1) - w(0)) }.toSeq
    val xbar = cents.sum / cents.length
    val mrbar = mrs.sum / mrs.length
    val (ucl, lcl) = (xbar + 266 * mrbar / 100, xbar - 266 * mrbar / 100)
    rows.foreach { case (c, _, xb, u, l, flag) =>
      assert(xb == xbar && u == ucl && l == lcl)
      assert(flag == (c > ucl || c < lcl))
    }
  }

  test("round numbers: ppm rates replay from exact cents") {
    val rows = graft.operators.Quality.roundNumbers(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val cents = sf.orders.select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0),
        (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact))
    val byP = cents.groupBy(_._1)
    val gw = cents.count(_._2 % 100 == 0).toLong
    val gn = cents.length.toLong
    rows.foreach { case (p, n, w, d, wppm, dppm, ratio) =>
      val g = byP(p).map(_._2)
      assert(n == g.length && w == g.count(_ % 100 == 0) && d == g.count(_ % 10 == 0))
      assert(wppm == w * 1000000L / n && dppm == d * 1000000L / n)
      assert(ratio == (w * 1000000L / n) * 1000000L / (gw * 1000000L / gn))
    }
    assert(rows.map(_._2).sum == gn)
  }

  test("encoding sanity: planted mojibake/control/replacement chars are caught") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-enc").toString
    Seq(
      (0L, "clean plain text here", "en", "s", 21L),
      (1L, "bad \uFFFD replacement", "en", "s", 20L),
      (2L, "ctrl\u0001chars\u007Fhere", "en", "s", 18L),
      (3L, "mojibake caf\u00C3\u00A9 text", "en", "s", 20L),
      (4L, "tabs\tand\nnewlines ok", "en", "s", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.Quality.encodingSanity(Tables(spark, dir))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getBoolean(4))).sortBy(_._1)
    assert(rows(0)._5 && rows(4)._5, "clean and tab/newline docs pass")
    assert(!rows(1)._5 && rows(1)._2 == 1, "replacement char caught")
    assert(!rows(2)._5 && rows(2)._3 == 2, "control chars caught")
    assert(!rows(3)._5 && rows(3)._4 == 1, "mojibake digraph caught")
    // the real corpus is clean: every doc passes
    val corpus = graft.operators.Quality.encodingSanity(sf).collect()
    assert(corpus.forall(_.getBoolean(4)))
  }

  test("next purchase: directional counts replay from consecutive baskets") {
    val rows = graft.operators.Relational7.nextPurchase(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 50)
    // replay in memory
    val li = sf.lineitem.select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ord = sf.orders.selectExpr("o_orderkey", "o_custkey",
        "CAST(o_orderdate AS DATE) AS d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val basket = li.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).toSet }
    val counts = scala.collection.mutable.Map[(Long, Long), Long]()
    ord.filter(o => basket.contains(o._1)).groupBy(_._2).values.foreach { os =>
      val sorted = os.sortBy(o => (o._3.toEpochDay, o._1))
      sorted.sliding(2).foreach {
        case Array(o1, o2) =>
          for (a <- basket(o1._1); b <- basket(o2._1))
            counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    rows.foreach { case (a, b, n) => assert(counts((a, b)) == n, s"($a,$b)") }
    // top-k really is the maximum counts under the tie order
    val expect = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.take(50)
      .map { case ((a, b), n) => (a, b, n) }
    assert(rows.toSeq == expect)
  }

  test("url canonicalization: variants collapse, keeper is the min id") {
    val rows = graft.operators.Dedup.urlCanonical(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // canonical forms carry no scheme, www, port, utm, or trailing slash
    rows.foreach { case (c, _, _) =>
      assert(!c.contains("://") && !c.startsWith("www.") && !c.contains(":8")
        && !c.contains("utm_") && !c.endsWith("/"), c)
    }
    // the synthesis varies scheme/www/port/query across ids sharing a
    // path slot, so real collapses must occur
    assert(rows.exists(_._3 >= 2))
    assert(rows.map(_._3).sum == sf.documents.count())
    // keeper is the minimum doc_id of its group (replay via the formula)
    val docs = sf.documents.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def canon(id: Long, src: String): String = {
      val tld = (id % 3) match { case 0 => ".com"; case 1 => ".org"; case _ => ".net" }
      s"$src$tld/p/${id % 40}"
    }
    val groups = docs.groupBy { case (id, src) => canon(id, src) }
    rows.foreach { case (c, keep, n) =>
      val g = groups(c)
      assert(keep == g.map(_._1).min && n == g.length, c)
    }
  }

  test("ngram novelty: first docs are fully novel, owners partition the grams") {
    val rows = graft.operators.TextAnalysis2.ngramNovelty(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, nov, frac) =>
      assert(nov >= 0 && nov <= n && frac == nov.toDouble / n)
    }
    // the first doc by id that has grams is 100% novel
    assert(rows.minBy(_._1)._4 == 1.0)
    // total novel grams across docs = distinct grams in the corpus
    val docs = sf.documents.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val allGrams = docs.flatMap { case (_, tx) =>
      val ws = tx.split(" ")
      if (ws.length >= 5) ws.sliding(5).map(_.mkString(" ")).toSeq.distinct else Seq()
    }
    assert(rows.map(_._3).sum == allGrams.distinct.length)
  }

  test("dedup phash pairs: pigeonhole-complete vs the brute-force scan") {
    val sigs = graft.operators.Multimodal.phash(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if h <= 3
    } yield (math.min(sigs(i)._1, sigs(j)._1),
      math.max(sigs(i)._1, sigs(j)._1), h)).toSet
    val got = graft.operators.Multimodal.dedupPhash(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect, s"got ${got.size} expect ${expect.size}")
    assert(got.nonEmpty) // the mod-256 stub periodicity guarantees dups
  }

  test("embed drift report: cohort means replay, dims partitioned") {
    val rows = graft.operators.Embeddings.driftReport(sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    val nVec = sf.embeddings.count()
    rows.foreach { case (_, nc, mc, nb, mb, shift, drifted) =>
      assert(nc + nb == nVec)
      assert(shift == mb - mc)
      assert(drifted == (math.abs(shift) > 0.05))
      assert(mc > -1.0 && mc < 1.0 && mb > -1.0 && mb < 1.0)
    }
    // all dims reported exactly once
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.distinct)
  }

  test("community profile: sizes/edges reconcile with the shared LPA labels") {
    val labels = graft.operators.Graph.labelPropagation(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val rows = graft.operators.Graph.communityProfile(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val commSizes = labels.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (c, n, ie, ce, dens) =>
      assert(n == commSizes(c) && n >= 2)
      assert(dens == ie * 2000000L / (n * (n - 1)))
      assert(ie >= 0 && ce >= 0)
    }
    // every >= 2-member community appears exactly once
    assert(rows.length == commSizes.count(_._2 >= 2))
    // the profile reads the memoized labels: a repeat run is fast and equal
    val again = graft.operators.Graph.communityProfile(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.sameElements(again))
  }

  test("dedup tier eval: counts and ppm metrics replay from the two tiers") {
    val r = graft.operators.Dedup.tierEval(sf).collect()
    assert(r.length == 1)
    val (nt, ns, na, prec, rec) = (r(0).getLong(0), r(0).getLong(1),
      r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
    val truth = graft.operators.Dedup.ngramJaccard(sf).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val sim = graft.operators.Dedup.simhash(sf).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(nt == truth.size && ns == sim.size)
    assert(na == sim.intersect(truth).size)
    assert(prec == (if (ns > 0) na * 1000000L / ns else 0L))
    assert(rec == (if (nt > 0) na * 1000000L / nt else 0L))
  }

  test("burstiness: VMR replays with zero counts included") {
    val rows = graft.operators.TextAnalysis2.burstiness(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 40)
    val docs = sf.documents.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nd = docs.length.toLong
    rows.take(5).foreach { case (w, df, occ, vmr) =>
      val counts = docs.map(_._2.split(" ").count(_ == w).toLong)
      assert(df == counts.count(_ > 0))
      val s1 = counts.sum; val s2 = counts.map(c => c * c).sum
      assert(occ == s1)
      assert(vmr == (nd * s2 - s1 * s1) * 1000000L / (s1 * nd))
    }
    // ordered descending by dispersion
    assert(rows.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("elasticity: slope replays from exact power sums") {
    val rows = graft.operators.TimeSeries.elasticity(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // replay one brand
    val (brand, n, slope) = rows.head
    val pm = sf.lineitem
      .join(sf.part.select("p_partkey", "p_brand"),
        org.apache.spark.sql.functions.col("l_partkey") ===
          org.apache.spark.sql.functions.col("p_partkey"))
      .where(org.apache.spark.sql.functions.col("p_brand") === brand)
      .groupBy(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("l_shipdate"), "yyyy-MM").as("ym"))
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS LONG) div SUM(CAST(l_quantity AS LONG))").as("p"),
        org.apache.spark.sql.functions.expr("SUM(CAST(l_quantity AS LONG))").as("q"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(n == pm.length)
    val sx = pm.map(x => BigInt(x._1)).sum; val sy = pm.map(x => BigInt(x._2)).sum
    val sxx = pm.map(x => BigInt(x._1) * x._1).sum
    val sxy = pm.map(x => BigInt(x._1) * x._2).sum
    val expect = (BigInt(n) * sxy - sx * sy).toDouble /
      (BigInt(n) * sxx - sx * sx).toDouble
    assert(math.abs(slope - expect) < math.abs(expect) * 1e-9)
  }

  test("rag pipeline: only gated docs chunk, provenance and fingerprints hold") {
    val rows = graft.operators.Curation.ragPipeline(sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5)))
    assert(rows.nonEmpty)
    // the surviving doc set is exactly the gate conjunction
    val dom = graft.operators.Curation.domainFilter(sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val kb = graft.operators.Dedup.keepBest(sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val expectDocs = dom.keySet.filter(d => dom(d) && kb(d))
    assert(rows.map(_._1).toSet == expectDocs)
    // chunk geometry matches the standalone chunker for a surviving doc
    val standalone = graft.operators.TextAnalysis3.chunkOverlap(sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .filter(c => expectDocs(c._1)).toSet
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSet == standalone)
    // the md5 really fingerprints the chunk text
    val texts = sf.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(5).foreach { case (d, _, st, en, _, m) =>
      val chunk = texts(d).split(" ").slice(st, en).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(chunk.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(m == md)
    }
  }
}
