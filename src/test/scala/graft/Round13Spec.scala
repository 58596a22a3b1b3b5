package graft

import graft.operators.{Graph, Multimodal, Ranks, Relational12, Sampling, TextAnalysis3}
import org.apache.spark.sql.functions._

/** Specs for the round-13 widening batch: the distributed prefix-scan
  * helper, lagged/rank series association, interval coalesce, FD audit,
  * BH control, hierarchy rollup, HT sampling audit, KL source drift,
  * gradient energy, and personalized PageRank.
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  test("withGlobalPrefixAggs matches a single-partition window scan") {
    val rows = Seq((5L, 2L), (1L, 7L), (9L, 1L), (3L, 4L), (7L, 3L),
      (2L, 9L), (8L, 2L), (4L, 6L), (6L, 5L), (0L, 8L))
    val df = rows.toDF("k", "v").repartition(4)
    val got = Ranks.withGlobalPrefixAggs(df, Seq(col("k")), Seq(
        ("cs", col("v"), "sum", true),
        ("ps", col("v"), "sum", false),
        ("pm", col("v"), "min", false)))
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("cs"),
        Option(r.getAs[java.lang.Long]("ps")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("pm")).map(_.toLong)))
      .sortBy(_._1)
    val sorted = rows.sortBy(_._1)
    var run = 0L; var mn = Option.empty[Long]
    sorted.zip(got).foreach { case ((k, v), (gk, cs, ps, pm)) =>
      assert(gk == k)
      assert(ps == (if (run == 0 && mn.isEmpty) None else Some(run)),
        s"excl sum at $k")
      assert(pm == mn, s"excl min at $k")
      run += v
      mn = Some(mn.fold(v)(math.min(_, v)))
      assert(cs == run, s"incl sum at $k")
    }
  }

  test("cross correlation: lag-0 r matches a driver recompute, all |r| <= 1") {
    val got = Relational12.crossCorrelation(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (0L to 7L))
    got.foreach { case (_, n, r) => assert(n > 100 && math.abs(r) <= 1.0) }
    // driver recompute of lag 0 on the calendar-bounded daily frame
    val daily = sf.lineitem
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4)) " +
        "AS DECIMAL(38,6))")).as("rev"), count(lit(1)).as("y"))
      .select(expr("CAST(rev * 1000000 AS BIGINT) div 1000000").as("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = daily.length.toDouble
    val sx = daily.map(_._1).sum.toDouble; val sy = daily.map(_._2).sum.toDouble
    val sxx = daily.map(d => d._1.toDouble * d._1).sum
    val syy = daily.map(d => d._2.toDouble * d._2).sum
    val sxy = daily.map(d => d._1.toDouble * d._2).sum
    val r0 = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(got.head._3 - r0) < 1e-9, s"${got.head._3} vs $r0")
  }

  test("kendall tau-b matches the brute-force pair scan") {
    val row = Relational12.kendallTau(sf).collect().head
    val daily = sf.lineitem
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4)) " +
        "AS DECIMAL(38,6))")).as("rev"), count(lit(1)).as("y"))
      .select(datediff(col("d"), to_date(lit("1970-01-01"))).cast("long"),
        expr("CAST(rev * 1000000 AS BIGINT) div 1000000"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L; var p = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val dx = java.lang.Long.signum(daily(j)._2 - daily(i)._2)
      val dy = java.lang.Long.signum(daily(j)._3 - daily(i)._3)
      p += 1
      if (dx * dy > 0) nc += 1 else if (dx * dy < 0) nd += 1
      if (dx == 0) tx += 1
      if (dy == 0) ty += 1
    }
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4)) == ((p, nc, nd, tx, ty)))
    val tau = (nc - nd).toDouble / math.sqrt((p - tx).toDouble * (p - ty))
    assert(math.abs(row.getDouble(5) - tau) < 1e-12)
  }

  test("temporal coalesce: island invariants + brute-force merge for one supplier") {
    val rows = Relational12.temporalCoalesce(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nIv, nIsl, covered, longest) =>
      assert(nIsl >= 1 && nIsl <= nIv)
      assert(longest >= 7 && covered >= longest)
      assert(covered <= nIv * 7, "islands can't cover more than the interval sum")
    }
    // brute-force island merge for the first supplier
    val supp = rows.head._1
    val days = sf.lineitem.where(col("l_suppkey") === supp)
      .select(datediff(col("l_shipdate").cast("date"),
        to_date(lit("1970-01-01"))).cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted
    var islands = List.empty[(Long, Long)] // (start, end)
    days.foreach { d =>
      islands match {
        case (s0, e0) :: rest if d <= e0 =>
          islands = (s0, math.max(e0, d + 7)) :: rest
        case _ => islands = (d, d + 7) :: islands
      }
    }
    val exp = rows.find(_._1 == supp).get
    assert(exp._2 == days.length)
    assert(exp._3 == islands.length)
    assert(exp._4 == islands.map { case (s, e) => e - s }.sum)
    assert(exp._5 == islands.map { case (s, e) => e - s }.max)
  }

  test("fd violations: rates in [0,1] and lhs counts match direct distincts") {
    val rows = Relational12.fdViolations(sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows.size == 5)
    rows.values.foreach { case (n, v, mx, rate) =>
      assert(v <= n && mx >= 1)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - v.toDouble / n) < 1e-12)
    }
    val nCust = sf.customer.select(countDistinct(col("c_nationkey")))
      .collect().head.getLong(0)
    assert(rows("customer.c_nationkey -> customer.c_mktsegment")._1 == nCust)
    // random lang per doc across 20 sources: the source->lang FD must break
    assert(rows("documents.source -> documents.lang")._2 > 0)
  }

  test("benjamini-hochberg: ranks are a permutation, crit decreasing, rejections a prefix") {
    val rows = Relational12.benjaminiHochberg(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    assert(rows.length == 25)
    assert(rows.map(_._5).toSeq == (1L to 25L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(math.abs(a._4) >= math.abs(b._4), "|z| sorted desc")
      assert(a._6 > b._6, "crit strictly decreasing in rank")
    }
    // rejected set is a prefix of the ranking (BH step-up contract)
    val rejected = rows.filter(_._7).map(_._5)
    assert(rejected.sameElements(1L to rejected.length))
    // every rejected rank's |z| clears its own critical value is NOT
    // required (step-up), but the LAST rejected rank's must
    if (rejected.nonEmpty) {
      val last = rows.find(_._5 == rejected.length).get
      assert(math.abs(last._4) >= last._6)
    }
  }

  test("hierarchy rollup: root aggregates the whole corpus, levels nest") {
    val rows = Relational12.hierarchyRollup(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val root = rows.find(_._1 == 0L).get
    val leafParts = sf.lineitem.select(countDistinct(col("l_partkey")))
      .collect().head.getLong(0)
    assert(root._2 == leafParts, "root counts every revenue-bearing part")
    // root revenue = Σ over parts of (part micros div 10⁶): whole
    // currency units per part BEFORE the corpus-wide sum, the overflow-
    // safe convention (micros at the root would overflow BIGINT ~sf30)
    val totalRev = sf.lineitem
      .groupBy("l_partkey")
      .agg(expr("CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4)) " +
        "AS DECIMAL(38,6))) * 1000000 AS BIGINT) div 1000000").as("r1"))
      .agg(sum(col("r1"))).collect().head.getLong(0)
    assert(root._3 == totalRev, "root subtree revenue is the corpus total")
    // every part with key >= 1 has exactly one level-1 ancestor (its
    // most significant digit); part 0 rolls up only to the root
    val level1 = rows.filter(n => n._1 >= 1 && n._1 <= 9).map(_._2).sum
    assert(level1 == leafParts || level1 == leafParts - 1)
    rows.foreach { case (_, np, rev) => assert(np >= 1 && rev >= 0) }
  }

  test("horvitz-thompson: keep decisions and estimator replay from the documents table") {
    val got = Sampling.horvitzThompson(sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val docs = sf.documents.select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def unitHash(id: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0
    }
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val kept = ds.filter { case (id, _, n) =>
        unitHash(id) < math.min(1.0, n / 600.0) }
      val ht = kept.map { case (_, _, n) => math.max(n, 600L) }.sum.toDouble
      val (gn, gk, gt, ghe) = got(src)
      assert(gn == ds.length && gk == kept.length)
      assert(gt == ds.map(_._3).sum)
      assert(math.abs(ghe - ht) < 1e-9, s"$src: $ghe vs $ht")
    }
  }

  test("kl source drift: non-negative, token totals match the explode") {
    val rows = TextAnalysis3.klSourceDrift(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == sf.documents.select("source").distinct().count().toInt)
    val totalTokens = sf.documents
      .select(explode(split(col("text"), " ")).as("t"))
      .where(length(col("t")) > 0).count()
    assert(rows.map(_._2).sum == totalTokens)
    rows.foreach { case (_, nt, types, kl) =>
      assert(types >= 1 && nt >= types)
      assert(kl >= -1e-9, "KL divergence is non-negative")
    }
  }

  test("gradient energy matches the pixel-formula recompute") {
    val direct = Multimodal.gradientEnergy(sf).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(direct.size == sf.documents.count().toInt)
    direct.foreach { case (id, (w, h, e)) =>
      assert(w == 8 + (id % 9).toInt && h == 8 + ((id * 3) % 9).toInt)
      def luma(x: Int, y: Int): Long =
        299L * ((id + 7 * x + 13 * y) % 256) +
          587L * ((2 * id + 11 * x + 3 * y) % 256) +
          114L * ((3 * id + 5 * x + 17 * y) % 256)
      var exp = 0L
      for (y <- 0 until h; x <- 0 until w) {
        if (x > 0) exp += math.abs(luma(x, y) - luma(x - 1, y))
        if (y > 0) exp += math.abs(luma(x, y) - luma(x, y - 1))
      }
      assert(e == exp, s"doc $id energy")
    }
  }

  test("backlog curve: non-negative, ends at the never-shipped order count") {
    val rows = Relational12.backlogCurve(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, b) => assert(b >= 0, "backlog never negative") }
    val nOrders = sf.orders.count()
    val nShipped = sf.lineitem.select("l_orderkey").distinct().count()
    assert(rows.last._3 == nOrders - nShipped,
      "final backlog = orders that never shipped a line")
    // deltas rebuild the curve exactly
    var acc = 0L
    rows.foreach { case (_, d, b) => acc += d; assert(acc == b) }
  }

  test("seasonal-naive MASE matches the driver lag recompute") {
    val row = Relational12.maseSeasonalNaive(sf).collect().head
    val daily = sf.lineitem
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4)) " +
        "AS DECIMAL(38,6))")).as("rev"))
      .select(datediff(col("d"), to_date(lit("1970-01-01"))).cast("long"),
        expr("CAST(rev * 1000000 AS BIGINT) div 1000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def mae(lag: Int): (Long, Long) = {
      val diffs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d - lag).map(xl => math.abs(x - xl)) }
      (diffs.length.toLong, diffs.sum)
    }
    val (n7, s7) = mae(7); val (n1, s1) = mae(1)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == ((n7, s7, n1, s1)))
    val mase = (s7.toDouble / n7) / (s1.toDouble / n1)
    assert(math.abs(row.getDouble(4) - mase) < 1e-12)
  }

  test("nelson-aalen: hazard increments match d/n and bound -ln(KM survival)") {
    val na = graft.operators.Analytics.nelsonAalen(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(na.nonEmpty)
    // cumulative hazard strictly increases by d/n at each event time
    var prev = 0.0
    na.foreach { case (_, n, d, h) =>
      assert(d >= 1 && n >= d)
      val inc = d.toDouble / n
      assert(math.abs(h - (prev + inc)) < 1e-9, s"increment mismatch at h=$h")
      prev = h
    }
    // H(t) >= -ln(S_km(t)) is false in general, but H <= -ln(S) holds
    // for the discrete estimators (1-x <= e^-x); check at the last time
    val km = graft.operators.Analytics.kaplanMeier(sf).collect()
      .map(r => r.getDouble(3)).last
    assert(na.last._4 <= -math.log(km) + 1e-9)
  }

  test("good-turing: spectrum identities per source") {
    val rows = graft.operators.TextAnalysis3.goodTuring(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.length == 20)
    rows.foreach { case (_, n, v, f1, f2, p0, chao1) =>
      assert(f1 + f2 <= v && v <= n)
      assert(math.abs(p0 - f1.toDouble / n) < 1e-15)
      assert(chao1 >= v.toDouble, "Chao1 never below observed richness")
    }
  }

  test("mm pair mining: value-factored miner equals brute force at spec scale") {
    val pairs = Multimodal.dedupDhash(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // brute force over the same fingerprints
    val fps = Multimodal.dhashReal(sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dhash"))).sortBy(_._1)
    val brute = for {
      i <- fps.indices; j <- (i + 1) until fps.length
      h = java.lang.Long.bitCount(fps(i)._2 ^ fps(j)._2)
      if h <= 3
    } yield (fps(i)._1, fps(j)._1, h.toLong)
    assert(pairs.toSeq == brute.sorted.toSeq)
  }

  test("two-nn: anchor count tracks the fixed target, not the corpus size") {
    val n = sf.embeddings.count()
    val anchors = graft.operators.Similarity.twoNn(sf).count()
    val mod = math.max(1L, n / 128)
    // every mod-th id is an anchor (minus any d1=0 exclusions)
    assert(anchors <= n / mod + 1)
    assert(anchors >= math.min(n, 64L), s"anchors=$anchors of n=$n")
  }

  test("heaps curve: monotone growth, top rung at corpus size, full vocabulary") {
    val rows = TextAnalysis3.heapsCurve(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach { case Array((_, v1), (_, v2)) => assert(v2 >= v1) }
    val fullVocab = sf.documents
      .select(explode(split(col("text"), " ")).as("t"))
      .where(length(col("t")) > 0).select("t").distinct().count()
    val nDocs = sf.documents.count()
    // corpus-derived ladder: the TOP rung sits exactly at the corpus
    // size (the r13 fixed ladder measured only its largest constant),
    // and there it reports the whole vocabulary
    assert(rows.last._1 == nDocs, s"top rung ${rows.last._1} != corpus $nDocs")
    assert(rows.last._2 == fullVocab)
    // ladder matches the shared derivation exactly
    assert(rows.map(_._1).toSeq == TextAnalysis3.heapsLadder(nDocs)
      .filter(_ > 0))
  }

  test("personal pagerank: teleport set non-empty, teleport floor holds, full node set") {
    val rows = Graph.personalPageRank(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val tele = rows.filter(_._2 == 1L)
    assert(tele.nonEmpty, "teleport set must be non-empty")
    // teleport nodes keep at least their teleport term after any superstep
    val telM = 1000000000000000L / tele.length
    tele.foreach { case (pk, _, femto, _) =>
      assert(femto >= (15L * telM) / 100L - 1, s"node $pk below teleport floor")
    }
    // non-teleport mass only arrives through edges; totals stay <= Mass
    assert(rows.map(_._3).sum <= 1000000000000000L)
    assert(rows.map(_._1).distinct.length == rows.length)
  }
}
