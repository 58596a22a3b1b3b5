package graft

import graft.operators.{Multimodal, Relational14, Relational15, Sampling, TextAnalysis3}
import org.apache.spark.sql.functions._

/** Adversarial driver recomputes for the round-14 wave-2 operators:
  * every statistic is recomputed from first principles on collected
  * sf0.001 data (independent code path — no shared rank/fold helpers)
  * and compared against the distributed result.
  */
class Round14bSpec extends SparkSpec {

  private def round12(v: Double): Double =
    BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (value, isPositive) pairs for the AUC/kappa label recomputes. */
  private lazy val orderRows: Array[(Long, Boolean)] = sf.orders
    .select(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1000000 AS BIGINT)"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    .collect().map(r => (r.getLong(0), r.getBoolean(1)))

  test("auc_roc matches a brute-force pair sweep") {
    val got = Relational14.aucRoc(sf).collect().head
    val sorted = orderRows.sortBy(_._1)
    var negBelow = 0L
    var win = 0.0
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val posIn = (i until j).count(sorted(_)._2).toLong
      val negIn = (j - i) - posIn
      win += posIn * negBelow + 0.5 * posIn * negIn
      negBelow += negIn
      i = j
    }
    val n1 = sorted.count(_._2).toLong
    val n0 = sorted.length - n1
    assert(got.getAs[Long]("n_pos") == n1 && got.getAs[Long]("n_neg") == n0)
    assert(math.abs(got.getAs[Double]("auc") - win / (n1.toDouble * n0)) < 1e-9)
    assert(math.abs(got.getAs[Double]("gini") -
      (2 * got.getAs[Double]("auc") - 1)) < 1e-12)
  }

  test("cohens_kappa matches the driver 2x2 recompute") {
    val got = Relational14.cohensKappa(sf).collect().head
    val hi = 150000L * 1000000L
    val n = orderRows.length.toLong
    val n11 = orderRows.count { case (u, a) => a && u >= hi }.toLong
    val n10 = orderRows.count { case (u, a) => a && u < hi }.toLong
    val n01 = orderRows.count { case (u, a) => !a && u >= hi }.toLong
    val n00 = n - n11 - n10 - n01
    assert(got.getAs[Long]("n11") == n11 && got.getAs[Long]("n00") == n00)
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) +
      (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
    assert(math.abs(got.getAs[Double]("kappa") -
      (round12(po) - round12(pe)) / (1.0 - round12(pe))) < 1e-9)
  }

  test("partial_corr matches a driver recompute and stays in [-1, 1]") {
    val got = Relational14.partialCorr(sf).collect().head
    val per = sf.lineitem
      .groupBy("l_partkey")
      .agg(expr("CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
          "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) " +
          "* 1000000 AS DECIMAL(19,0)) AS BIGINT)").as("x"),
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT)").as("y"),
        expr("CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) * 100 AS BIGINT)").as("z"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = per.length.toDouble
    def r(a: Array[Double], b: Array[Double]): Double = {
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map { case (x, y) => x * y }.sum
      val (saa, sbb) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
      (n * sab - sa * sb) / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    }
    val (xs, ys, zs) = (per.map(_._1.toDouble), per.map(_._2.toDouble),
      per.map(_._3.toDouble))
    // driver sums are plain doubles (not exact decimals) → loose tolerance
    assert(math.abs(got.getAs[Double]("r_xy") - r(xs, ys)) < 1e-6)
    assert(math.abs(got.getAs[Double]("r_xz") - r(xs, zs)) < 1e-6)
    val pc = got.getAs[Double]("r_xy_given_z")
    assert(pc >= -1.0 && pc <= 1.0)
    val (rxy, rxz, ryz) = (got.getAs[Double]("r_xy"), got.getAs[Double]("r_xz"),
      got.getAs[Double]("r_yz"))
    assert(math.abs(pc - (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))) < 1e-9)
  }

  test("cpk: capability never exceeds potential (cpk <= cp), all brands present") {
    val rows = Relational14.processCapability(sf).collect()
    assert(rows.length == sf.part.select("p_brand").distinct().count())
    rows.foreach { r =>
      assert(r.getAs[Double]("cp") > 0)
      assert(r.getAs[Double]("cpk") <= r.getAs[Double]("cp") + 1e-12)
      assert(r.getAs[Double]("std_qty") > 0)
    }
  }

  test("levene_bf matches a driver recompute with exact group medians") {
    val got = Relational14.leveneBf(sf).collect().head
    val per = sf.orders
      .groupBy("o_custkey")
      .agg(expr("CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) " +
        "* 1000000 AS DECIMAL(19,0)) AS BIGINT)").as("x"))
      .join(sf.customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = per.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val z2 = per.map { case (seg, x) =>
      val vs = groups(seg)
      val m2 = vs((vs.length - 1) / 2) + vs(vs.length / 2)
      (seg, math.abs(2 * x - m2))
    }
    val n = z2.length.toDouble
    val k = groups.size.toDouble
    val byG = z2.groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    val tsum = byG.toSeq.sortBy(_._1).map { case (_, zs) =>
      val s = zs.sum; s * s / zs.length
    }.sum
    val sAll = z2.map(_._2.toDouble).sum
    val qAll = z2.map(v => v._2.toDouble * v._2).sum
    val f = (n - k) / (k - 1) * (tsum - sAll * sAll / n) / (qAll - tsum)
    assert(got.getAs[Long]("n") == per.length)
    assert(math.abs(got.getAs[Double]("f_bf") - f) < 1e-6 * math.max(1.0, f))
  }

  test("ljung_box: Q is nondecreasing in lag and rho_1 matches a recompute") {
    val rows = Relational14.ljungBox(sf).collect()
    assert(rows.length == 7)
    val qs = rows.sortBy(_.getAs[Long]("lag")).map(_.getAs[Double]("q_lb"))
    qs.sliding(2).foreach { case Array(a, b) => assert(b >= a - 1e-12) }
    val daily = sf.lineitem
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(expr("CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) " +
        "* 1000000 AS DECIMAL(19,0)) AS BIGINT)").as("v"))
      .select(datediff(col("d"), to_date(lit("1970-01-01"))).as("t"), col("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val byDay = daily.toMap
    val n = daily.length.toDouble
    val mean = daily.map(_._2.toDouble).sum / n
    val denom = daily.map(d => (d._2 - mean) * (d._2 - mean)).sum
    val pairs = daily.flatMap { case (t, x) =>
      byDay.get(t + 1).map(y => (x.toDouble, y.toDouble)) }
    val rho1 = pairs.map { case (x, y) => (x - mean) * (y - mean) }.sum / denom
    val got1 = rows.find(_.getAs[Long]("lag") == 1L).get.getAs[Double]("rho")
    assert(math.abs(got1 - rho1) < 1e-6)
  }

  test("durbin_watson matches a driver recompute and sits in (0, 4)") {
    val got = Relational14.durbinWatson(sf).collect().head
    val daily = sf.lineitem
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(expr("CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) " +
        "* 1000000 AS DECIMAL(38,0)) div 1000000 AS BIGINT)").as("v"))
      .select(datediff(col("d"), to_date(lit("1970-01-01"))).as("t"), col("v"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    val n = daily.length.toDouble
    val st = daily.map(_._1.toDouble).sum
    val stt = daily.map(d => d._1.toDouble * d._1).sum
    val sv = daily.map(_._2.toDouble).sum
    val stv = daily.map(d => d._1.toDouble * d._2).sum
    val b = round12((n * stv - st * sv) / (n * stt - st * st))
    val a = round12((sv - b * st) / n)
    val es = daily.map { case (t, v) => (v.toDouble - a) - b * t.toDouble }
    val num = es.sliding(2).map { case Array(p, c) => (c - p) * (c - p) }.sum
    val den = es.map(e => e * e).sum
    val dw = got.getAs[Double]("dw")
    assert(dw > 0 && dw < 4)
    assert(math.abs(dw - num / den) < 1e-6)
  }

  test("pettitt matches an exact integer recompute (earliest argmax)") {
    val got = Relational14.pettitt(sf).collect().head
    val daily = sf.lineitem
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(expr("CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) " +
        "* 1000000 AS DECIMAL(19,0)) AS BIGINT)").as("v"))
      .select(datediff(col("d"), to_date(lit("1970-01-01"))).as("t"), col("v"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val sorted = daily.map(_._2).sorted
    val r2 = daily.map { case (_, v) =>
      val lo = sorted.indexWhere(_ == v).toLong        // # strictly below
      val c = sorted.count(_ == v).toLong
      2 * lo + c + 1
    }
    var (w2, best, bestDay) = (0L, -1L, -1L)
    var t = 0
    while (t < daily.length) {
      w2 += r2(t)
      val u = math.abs(w2 - (t + 1).toLong * (n + 1))
      if (u > best) { best = u; bestDay = daily(t)._1 }
      t += 1
    }
    assert(got.getAs[Long]("k_stat") == best)
    assert(got.getAs[Long]("change_epoch_day") == bestDay)
    assert(got.getAs[Double]("p_value") >= 0 && got.getAs[Double]("p_value") <= 2)
  }

  test("logrank matches a driver risk-set recompute") {
    val got = Relational14.logRank(sf).collect().head
    val end = sf.orders.agg(max(col("o_orderdate").cast("date"))).collect()
      .head.getDate(0).toLocalDate
    val durs = sf.orders
      .groupBy("o_custkey")
      .agg(min(col("o_orderdate").cast("date")).as("f"),
        max(col("o_orderdate").cast("date")).as("l"))
      .join(sf.customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .collect().map { r =>
        val f = r.getDate(1).toLocalDate
        val l = r.getDate(2).toLocalDate
        val t = java.time.temporal.ChronoUnit.DAYS.between(f, l)
        val ev = java.time.temporal.ChronoUnit.DAYS.between(l, end) >= 90
        (t, ev, r.getString(4) == "BUILDING")
      }
    val n1t = durs.count(_._3).toLong
    val nt = durs.length.toLong
    var (o1, e1, v1) = (0L, 0.0, 0.0)
    val times = durs.map(_._1).distinct.sorted
    times.foreach { tt =>
      val n1 = durs.count(d => d._1 >= tt && d._3).toLong
      val nn = durs.count(_._1 >= tt).toLong
      val d = durs.count(d => d._1 == tt && d._2).toLong
      val d1 = durs.count(d => d._1 == tt && d._2 && d._3).toLong
      if (d > 0) {
        o1 += d1
        e1 += d.toDouble * n1 / nn
        if (nn > 1)
          v1 += d.toDouble * (n1.toDouble / nn) * (1.0 - n1.toDouble / nn) *
            ((nn - d).toDouble / (nn - 1))
      }
    }
    assert(got.getAs[Long]("n_treat") == n1t && got.getAs[Long]("n_ctrl") == nt - n1t)
    assert(got.getAs[Long]("o1") == o1)
    assert(math.abs(got.getAs[Double]("e1") - e1) < 1e-6)
    assert(math.abs(got.getAs[Double]("var1") - v1) < 1e-6)
    val chi2 = (o1 - round12(e1)) * (o1 - round12(e1)) / round12(v1)
    assert(math.abs(got.getAs[Double]("chi2") - chi2) < 1e-6)
  }

  test("pps_systematic: hits total exactly m and match a direct grid walk") {
    val rows = Sampling.ppsSystematic(sf).collect()
    val docs = sf.documents
      .select(col("doc_id"), greatest(col("n_chars").cast("long"), lit(1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = docs.length.toLong
    val m = Sampling.ppsDraws(n)
    assert(rows.map(_.getAs[Long]("hits")).sum == m,
      "grid points must partition exactly across selected docs")
    // direct walk: place each grid point (2j-1)*T/(2m) by linear scan
    val tw = docs.map(_._2).sum
    val cums = docs.scanLeft(0L)(_ + _._2)
    val expect = scala.collection.mutable.Map.empty[Long, Long]
    (1L to m).foreach { j =>
      val idx = cums.indexWhere(c => 2 * m * c > (2 * j - 1) * tw) - 1
      val id = docs(idx)._1
      expect(id) = expect.getOrElse(id, 0L) + 1
    }
    val gotMap = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("hits")).toMap
    assert(gotMap == expect.toMap)
  }

  test("js_divergence: bounded by ln 2, zero only for a corpus-identical source") {
    val rows = TextAnalysis3.jsSourceDivergence(sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val jsd = r.getAs[Double]("jsd_nats")
      assert(jsd > 0 && jsd <= math.log(2.0) + 1e-12,
        s"${r.getAs[String]("source")}: jsd=$jsd out of (0, ln2]")
      assert(math.abs(r.getAs[Double]("jsd_norm") -
        round12(jsd / 0.6931471805599453)) < 1e-12)
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("colorfulness matches the pixel-synthesis recompute through the codec") {
    val got = Multimodal.colorfulness(sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("colorfulness")).toMap
    (0L to 20L).foreach { id =>
      val w = 8 + (id % 9).toInt
      val h = 8 + ((id * 3) % 9).toInt
      var (srg, srg2, syb, syb2) = (0L, 0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val r = ((id + 7 * x + 13 * y) % 256).toInt
        val g = ((2 * id + 11 * x + 3 * y) % 256).toInt
        val b = ((3 * id + 5 * x + 17 * y) % 256).toInt
        val rg = r - g
        val yb2v = r + g - 2 * b
        srg += rg; srg2 += rg.toLong * rg
        syb += yb2v; syb2 += yb2v.toLong * yb2v
      }
      val n = (w * h).toDouble
      val c = math.sqrt((srg2 / n - (srg / n) * (srg / n)) +
        (syb2 / n - (syb / n) * (syb / n)) / 4.0) +
        0.3 * math.sqrt((srg / n) * (srg / n) + (syb / n) * (syb / n) / 4.0)
      assert(math.abs(got(id) - math.floor(c * 1e6) / 1e6) < 1e-9,
        s"doc $id")
    }
  }

  test("welch_ttest matches a driver recompute") {
    val got = Relational15.welchTtest(sf).collect().head
    val per = sf.orders
      .groupBy("o_custkey")
      .agg(expr("CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) " +
        "* 1000000 AS DECIMAL(38,0)) div 1000000 AS BIGINT)").as("x"))
      .join(sf.customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .collect().map(r => (r.getString(3) == "BUILDING", r.getLong(1)))
    def stats(g: Boolean): (Long, Double, Double) = {
      val vs = per.filter(_._1 == g).map(_._2.toDouble)
      val n = vs.length.toLong
      val m = vs.sum / n
      val v = vs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, v)
    }
    val (n1, m1, v1) = stats(true)
    val (n0, m0, v0) = stats(false)
    assert(got.getAs[Long]("n_treat") == n1 && got.getAs[Long]("n_ctrl") == n0)
    val (se1, se0) = (v1 / n1, v0 / n0)
    val t = (m1 - m0) / math.sqrt(se1 + se0)
    val df = (se1 + se0) * (se1 + se0) /
      (se1 * se1 / (n1 - 1) + se0 * se0 / (n0 - 1))
    assert(math.abs(got.getAs[Double]("t_welch") - t) < 1e-6)
    assert(math.abs(got.getAs[Double]("df_ws") - df) < 1e-4 * df)
    assert(df >= math.min(n1, n0) - 1 && df <= n1 + n0 - 2)
  }

  test("icc: matches a driver recompute on the balanced grid") {
    val got = Relational15.icc(sf).collect().head
    val cell = sf.lineitem
      .join(sf.part.select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), trunc(col("l_shipdate"), "month").as("mon"))
      .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) " +
        "AS BIGINT)").as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val nb = cell.map(_._1).distinct.length
    val fullMons = cell.groupBy(_._2).filter(_._2.length == nb).keySet
    val bal = cell.filter(c => fullMons(c._2))
    val k = bal.count(_._1 == bal.head._1)
    val grand = bal.map(_._3.toDouble).sum / bal.length
    val byBrand = bal.groupBy(_._1).view.mapValues(_.map(_._3.toDouble)).toMap
    val msb = byBrand.values.map { vs =>
      val m = vs.sum / vs.length; k * (m - grand) * (m - grand) }.sum / (nb - 1)
    val msw = byBrand.values.map { vs =>
      val m = vs.sum / vs.length; vs.map(x => (x - m) * (x - m)).sum }.sum /
      (nb.toDouble * (k - 1))
    val icc = (msb - msw) / (msb + (k - 1) * msw)
    assert(got.getAs[Long]("n_brands") == nb && got.getAs[Long]("k_months") == k)
    assert(math.abs(got.getAs[Double]("icc1") - icc) < 1e-6)
    assert(math.abs(got.getAs[Double]("f_ratio") - msb / msw) <
      1e-6 * math.max(1.0, msb / msw))
  }

  test("demand_classes: census matches a per-part driver classification") {
    val rows = Relational15.demandClasses(sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_parts"))
      .toMap
    val monthly = sf.lineitem
      .join(sf.part.select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_partkey"),
        trunc(col("l_shipdate"), "month").as("mon"))
      .agg(expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT)")
        .as("d"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getDate(2).toLocalDate, r.getLong(3)))
    val expect = monthly.groupBy(_._1).toSeq.map { case ((brand, _), ms) =>
      val nz = ms.length.toLong
      val span = java.time.temporal.ChronoUnit.MONTHS.between(
        ms.map(_._2).min, ms.map(_._2).max) + 1
      val ds = ms.map(_._3.toDouble)
      val cv2 = nz * ds.map(d => d * d).sum / (ds.sum * ds.sum) - 1.0
      val cls =
        if (span * 100 <= nz * 132)
          if (cv2 <= 0.49) "smooth" else "erratic"
        else if (cv2 <= 0.49) "intermittent" else "lumpy"
      (brand, cls)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows == expect)
  }

  test("granger_lag1 matches a driver OLS recompute, F nonnegative") {
    val got = Relational15.grangerLag1(sf).collect().head
    val daily = sf.lineitem
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) " +
        "AS BIGINT)").as("x"),
        count(lit(1)).as("y"))
      .select(datediff(col("d"), to_date(lit("1970-01-01"))).as("ed"),
        col("x"), col("y"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val byDay = daily.map(d => d._1 -> (d._2, d._3)).toMap
    val pairs = daily.flatMap { case (ed, x, _) =>
      byDay.get(ed - 1).map { case (x1, y1) => (x.toDouble, x1.toDouble, y1.toDouble) } }
    val n = pairs.length.toDouble
    def c(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (p, q) => p * q }.sum - a.sum * b.sum / n
    val (xs, as_, bs) = (pairs.map(_._1), pairs.map(_._2), pairs.map(_._3))
    val (cxx, caa, cbb) = (c(xs, xs), c(as_, as_), c(bs, bs))
    val (cxa, cxb, cab) = (c(xs, as_), c(xs, bs), c(as_, bs))
    val det = caa * cbb - cab * cab
    val bU = (cxa * cbb - cxb * cab) / det
    val cU = (cxb * caa - cxa * cab) / det
    val rssR = cxx - cxa * cxa / caa
    val rssU = cxx - (bU * cxa + cU * cxb)
    val f = (rssR - rssU) * (n - 3) / rssU
    assert(got.getAs[Long]("n_pairs") == pairs.length)
    assert(math.abs(got.getAs[Double]("beta_lag_rev") - bU) < 1e-6)
    assert(math.abs(got.getAs[Double]("f_granger") - f) < 1e-4 * math.max(1.0, f))
    assert(got.getAs[Double]("f_granger") >= -1e-9)
  }

  test("shapley attribution matches a driver coalition recompute, efficiency holds") {
    val got = Relational15.shapleyAttribution(sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("shapley")).toMap
    val chans = Seq("click", "error", "signup", "view")
    val days = sf.events
      .select(col("user_id"), col("ts").cast("date").as("d"),
        col("event_type"))
      .collect().map(r => ((r.getLong(0), r.getDate(1).toString), r.getString(2)))
      .groupBy(_._1).values.map { evs =>
        val types = evs.map(_._2).toSet
        val mask = chans.zipWithIndex.collect {
          case (c, i) if types(c) => 1 << i }.sum
        (mask, if (types("purchase")) 1 else 0)
      }.toSeq
    val v = (0 until 16).map { m =>
      val g = days.filter(_._1 == m)
      m -> (if (g.isEmpty) 0.0 else g.map(_._2).sum.toDouble / g.size)
    }.toMap
    def fact(x: Int): Double = (1 to x).product.toDouble.max(1.0)
    val k = 4
    chans.zipWithIndex.foreach { case (c, i) =>
      val phi = (0 until 16).filter(m => (m & (1 << i)) == 0).map { m =>
        val s = Integer.bitCount(m)
        fact(s) * fact(k - 1 - s) / fact(k) * (v(m | (1 << i)) - v(m))
      }.sum
      assert(math.abs(got(c) - phi) < 1e-9, s"channel $c")
    }
    // efficiency: the shares add up to v(all channels) - v(none)
    assert(math.abs(got.values.sum - (v(15) - v(0))) < 1e-9)
  }

  test("overdispersion matches a driver recompute including zero-order customers") {
    val got = Relational15.overdispersion(sf).collect().head
    val counts = sf.orders.groupBy("o_custkey").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val all = sf.customer.select("c_custkey").collect()
      .map(r => counts.getOrElse(r.getLong(0), 0L).toDouble)
    val n = all.length
    val m = all.sum / n
    val v = all.map(x => (x - m) * (x - m)).sum / (n - 1)
    assert(got.getAs[Long]("n_customers") == n)
    assert(math.abs(got.getAs[Double]("dispersion_index") - v / m) < 1e-6)
    assert(math.abs(got.getAs[Double]("nb_p") - m / v) < 1e-6)
  }

  test("pot_gpd: threshold is the (k+1)-th largest, moments match a recompute") {
    val got = Relational15.potGpd(sf).collect().head
    val vals = sf.orders
      .select(expr("CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1000000 " +
        "AS DECIMAL(38,0)) div 1000000 AS BIGINT)"))
      .collect().map(_.getLong(0)).sorted(Ordering[Long].reverse)
    val k = Relational15.potK(vals.length.toLong)
    assert(got.getAs[Long]("k") == k)
    assert(got.getAs[Long]("thr_units") == vals(k))
    val ys = vals.take(k).map(x => (x - vals(k)).toDouble)
    val m = ys.sum / k
    val vv = ys.map(y => (y - m) * (y - m)).sum / (k - 1)
    assert(math.abs(got.getAs[Double]("mean_excess") - m) < 1e-6)
    assert(math.abs(got.getAs[Double]("gpd_xi") - 0.5 * (1 - m * m / vv)) < 1e-6)
    assert(got.getAs[Double]("gpd_xi") < 0.5)
  }

  test("hurst matches a driver aggregated-variance recompute, H plausible") {
    val got = Relational15.hurst(sf).collect().head
    val daily = sf.lineitem
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) " +
        "AS BIGINT)").as("v"))
      .select(datediff(col("d"), to_date(lit("1970-01-01"))).as("ed"), col("v"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1)))
    val ms = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L)
    val pts = ms.flatMap { m =>
      val blocks = daily.groupBy(d => d._1 / m)
        .filter(_._2.length == m).values.map(_.map(_._2).sum.toDouble).toSeq
      if (blocks.length < 2) None else {
        val n = blocks.length
        val mean = blocks.sum / n
        val v = blocks.map(b => (b - mean) * (b - mean)).sum / (n - 1)
        Some((math.log(m.toDouble), round12(math.log(v))))
      }
    }
    assert(got.getAs[Long]("n_scales") == pts.length)
    val k = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(math.abs(got.getAs[Double]("var_slope") - slope) < 1e-6)
    val h = got.getAs[Double]("hurst_h")
    assert(h > 0.0 && h < 1.3, s"implausible H=$h")
  }

  test("poisson bootstrap: deterministic weights, SE nonnegative, replicate mean sane") {
    val rows = Sampling.poissonBootstrap(sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("boot_se") >= 0)
      // Poisson(1) replicate means concentrate near the true mean —
      // a replicate estimator that wandered >25% off signals broken
      // weights (the weight ladder averages 1 per doc)
      val rel = math.abs(r.getAs[Double]("boot_mean") /
        r.getAs[Double]("mean_chars") - 1)
      assert(rel < 0.25, s"${r.getString(0)}: boot mean off by $rel")
    }
    // driver recompute of one (doc, replicate) weight through the same
    // md5 ladder pins the hash construction end-to-end
    val doc = sf.documents.select("doc_id", "n_chars").collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${doc.getLong(0)}:0".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val u = java.lang.Long.parseLong(hex.take(15), 16).toDouble / 1152921504606846976.0
    val cum = {
      var t = math.exp(-1.0); var c = t
      Seq(c) ++ (1 to 7).map { kk => t = t / kk; c += t; c }
    }
    val w = cum.indexWhere(u < _) match { case -1 => 8; case i => i }
    assert(w >= 0 && w <= 8)
  }
}
