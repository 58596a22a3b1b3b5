package graft

import graft.operators.{Ranks, Relational13}
import org.apache.spark.sql.functions._

/** Specs for the round-14 fixes: the shared-RDD prefix-scan helper and
  * its determinism at sampling scale.
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  test("withGlobalPrefixAggs exact at sampling scale (one set of range bounds)") {
    // 200k rows over 32 shuffle partitions ≫ RangePartitioner's
    // per-partition reservoir (~60 rows at defaults): the sampler
    // genuinely subsamples, so if the totals job and the output job ran
    // the range shuffle twice with different bounds (the pre-r14 hazard:
    // reservoir seed = rdd.id, which differs per re-planned action),
    // rows would join offsets computed for a DIFFERENT _pid and the
    // prefix sums below would be wrong with overwhelming probability.
    val n = 200000
    // deterministic shuffled key order: id → (a·id + c) mod n is a
    // bijection because gcd(48271, 200000) = 1; values derived from key
    val df = spark.range(n)
      .select(((col("id") * 48271L + 12345L) % n).as("k"))
      .select(col("k"), (col("k") % 97).as("v"))
    val out = Ranks.withGlobalPrefixAggs(df, Seq(col("k")), Seq(
        ("cs", col("v"), "sum", true),
        ("pm", col("v"), "min", false)))
      .select("k", "cs", "pm").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[java.lang.Long]("pm")).map(_.toLong)))
      .sortBy(_._1)
    assert(out.length == n)
    // driver recompute: keys are a permutation of 0..n-1, v = k % 97
    var run = 0L
    var mn = Option.empty[Long]
    var k = 0L
    out.foreach { case (gk, cs, pm) =>
      assert(gk == k, s"rank order broke at $k")
      val v = k % 97
      assert(pm == mn, s"excl min at $k")
      run += v
      mn = Some(mn.fold(v)(math.min(_, v)))
      assert(cs == run, s"incl sum at $k: $cs vs $run")
      k += 1
    }
  }

  test("spearman: rho matches a driver recompute with tie-averaged ranks") {
    val got = Relational13.spearman(sf).collect().head
    val per = sf.lineitem
      .groupBy("l_partkey")
      .agg(expr("CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
          "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) " +
          "* 1000000 AS DECIMAL(19,0)) AS BIGINT)").as("ux"),
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT)").as("uy"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def ranks2(vs: Array[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      val grouped = sorted.groupBy(identity).map { case (v, g) =>
        val s = sorted.indexWhere(_ == v) // predecessors = first index
        v -> (2L * s + g.length + 1)
      }
      grouped
    }
    val rx = ranks2(per.map(_._1)); val ry = ranks2(per.map(_._2))
    val xs = per.map(p => rx(p._1).toDouble); val ys = per.map(p => ry(p._2).toDouble)
    val n = per.length.toDouble
    val num = n * xs.zip(ys).map(p => p._1 * p._2).sum - xs.sum * ys.sum
    val den = math.sqrt((n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
      (n * ys.map(y => y * y).sum - ys.sum * ys.sum))
    assert(got.getLong(0) == per.length)
    assert(math.abs(got.getDouble(1) - num / den) < 1e-9,
      s"${got.getDouble(1)} vs ${num / den}")
  }

  test("hill tail: threshold is the (k+1)-th largest order value, alpha positive") {
    val got = Relational13.hillTail(sf).collect().head
    val n = got.getLong(0); val k = got.getLong(1)
    assert(k == Relational13.hillK(n).toLong)
    val vals = sf.orders
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1000000 AS BIGINT)"))
      .collect().map(_.getLong(0)).sorted(Ordering[Long].reverse)
    assert(got.getLong(2) == vals(k.toInt), "threshold = (k+1)-th order stat")
    assert(got.getAs[Double]("alpha") > 0)
    // driver fold of the same ratio sum
    val sl = (0 until k.toInt).map(i => math.log(vals(i).toDouble / vals(k.toInt))).sum
    assert(math.abs(got.getAs[Double]("sum_log") - sl) < 1e-6)
  }

  test("theil index: decomposition reconstructs the overall index, shares sum to 1") {
    val rows = Relational13.theilIndex(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-9, "shares sum to 1")
    rows.foreach { case (nm, nc, _, tw, s, _) =>
      assert(nc >= 1 && s > 0 && tw >= -1e-12, s"$nm within-Theil $tw") }
    // T_total = T_between + Σ s_g · T_g against a driver recompute
    val per = sf.orders.groupBy("o_custkey")
      .agg(expr("CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) " +
        "* 1000000 AS DECIMAL(19,0)) AS BIGINT)").as("x"))
      .collect().map(_.getLong(1))
    val mu = per.map(_.toDouble).sum / per.length
    val tTotal = per.map { x => (x / mu / per.length) * math.log(x / mu) }.sum
    val reconstructed = rows.map(_._6).sum +
      rows.map(r => r._5 * r._4).sum
    assert(math.abs(tTotal - reconstructed) < 1e-6, s"$tTotal vs $reconstructed")
  }

  test("shannon entropy: bounded by ln(classes), perplexity consistent") {
    val rows = Relational13.shannonEntropy(sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, c, h, p) =>
      assert(n >= c && h >= -1e-12 && h <= math.log(c.toDouble) + 1e-9)
      assert(math.abs(p - math.exp(h)) < 1e-6)
    }
  }

  test("mutual information: nonnegative, bounded by marginal entropies, nmi in [0,1]") {
    val r = Relational13.mutualInformation(sf).collect().head
    val mi = r.getAs[Double]("mi_nats")
    val hx = r.getAs[Double]("h_type"); val hy = r.getAs[Double]("h_dow")
    assert(mi >= -1e-9 && mi <= math.min(hx, hy) + 1e-9)
    val nmi = r.getAs[Double]("nmi")
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9)
  }

  test("propensity match: every pair within caliper and truly nearest") {
    val rows = Relational13.propensityMatch(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val c = sf.customer.select(col("c_custkey"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"),
        col("c_mktsegment") === "BUILDING")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val controls = c.filter(!_._3)
    rows.foreach { case (tk, tc, ck, cc, d) =>
      assert(d == math.abs(tc - cc) && d <= 1000)
      val best = controls.map(x => (math.abs(tc - x._2), x._1)).min
      assert((d, ck) == best, s"treated $tk matched ($d,$ck) vs best $best")
    }
    // every treated customer with an in-caliper control is matched
    val treated = c.filter(_._3)
    val expected = treated.count(t => controls.exists(x => math.abs(t._2 - x._2) <= 1000))
    assert(rows.length == expected)
  }

  test("kruskal-wallis: H matches a driver tie-rank recompute") {
    val r = Relational13.kruskalWallis(sf).collect().head
    val per = sf.orders.groupBy("o_custkey")
      .agg(expr("CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) " +
        "* 1000000 AS DECIMAL(19,0)) AS BIGINT)").as("x"))
      .join(sf.customer, col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "x")
      .collect().map(rr => (rr.getString(0), rr.getLong(1)))
    val n = per.length
    val sorted = per.map(_._2).sorted
    val rank2 = sorted.groupBy(identity).map { case (v, g) =>
      v -> (2L * sorted.indexWhere(_ == v) + g.length + 1) }
    val groups = per.groupBy(_._1)
    val rsum = groups.values.map { g =>
      val s2 = g.map(p => rank2(p._2)).sum.toDouble
      s2 * s2 / (4.0 * g.length) }.sum
    val h = 12.0 / (n.toDouble * (n + 1)) * rsum - 3.0 * (n + 1)
    assert(r.getLong(0) == n && r.getLong(1) == groups.size)
    assert(math.abs(r.getAs[Double]("h") - h) < 1e-6,
      s"${r.getAs[Double]("h")} vs $h")
    assert(r.getAs[Double]("h_tie_corrected") >= r.getAs[Double]("h") - 1e-9)
  }

  test("friedman: complete blocks only, k = 12, chi2 nonnegative") {
    val r = Relational13.friedmanTest(sf).collect().head
    assert(r.getLong(1) == 12)
    assert(r.getLong(0) >= 1)
    assert(r.getAs[Double]("chi2_f") >= -1e-9)
  }

  test("extreme value: moments match a driver recompute, return level above the mean") {
    val r = Relational13.extremeValue(sf).collect().head
    val mx = sf.lineitem
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(expr("CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4)) " +
        "AS DECIMAL(38,6))) * 1000000 AS DECIMAL(38,0)) div 1000000").as("u"))
      .groupBy(trunc(col("d"), "month")).agg(max(col("u")).as("mx"))
      .collect().map(_.getLong(1).toDouble)
    val m = mx.sum / mx.length
    val s = math.sqrt(mx.map(x => (x - m) * (x - m)).sum / (mx.length - 1))
    assert(r.getLong(0) == mx.length)
    assert(math.abs(r.getAs[Double]("mean_max") - m) < 1e-4 * m)
    assert(math.abs(r.getAs[Double]("std_max") - s) < 1e-4 * s + 1e-6)
    assert(r.getAs[Double]("gumbel_beta") > 0)
    assert(r.getAs[Double]("return_level_100") > r.getAs[Double]("mean_max"))
  }

  test("sample ESS: bounded by n, equals n on equal weights") {
    val rows = graft.operators.Sampling.sampleEss(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, ess, ratio) =>
      assert(ess > 0 && ess <= n + 1e-9, s"$src ESS $ess of $n")
      assert(math.abs(ratio - ess / n) < 1e-9)
    }
    // driver recompute for one source
    val (src0, _, ess0, _) = rows.head
    val w = sf.documents.where(col("source") === src0)
      .select("n_chars").collect().map(_.getLong(0).toDouble)
    val expect = w.sum * w.sum / w.map(x => x * x).sum
    assert(math.abs(ess0 - expect) < 1e-6, s"$ess0 vs $expect")
  }

  test("tfidf top terms: 5 per source, scores non-increasing, counts exact") {
    val rows = graft.operators.TextAnalysis3.tfidfTopTerms(sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val bySrc = rows.groupBy(_._1)
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length) && rs.length <= 5)
      rs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._6 >= b._6 - 1e-12, s"$src rank order")
        case _ =>
      }
    }
    // spot-check one (source, token) tf against a direct count
    val (s0, _, tok0, tf0, _, _) = rows.head
    val direct = sf.documents.where(col("source") === s0)
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") === tok0).count()
    assert(tf0 == direct)
  }

  test("participation ratio: in [1, d], matches a driver eigen-free recompute") {
    val r = graft.operators.Embeddings.participationRatio(sf).collect().head
    val pr = r.getAs[Double]("participation_ratio")
    assert(pr >= 1.0 - 1e-9 && pr <= 64.0 + 1e-9, s"PR $pr")
    // driver recompute: covariance trace and Frobenius norm
    val vecs = sf.embeddings.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vecs.length; val d = vecs.head.length
    val mean = Array.tabulate(d)(j => vecs.map(_(j)).sum / n)
    var tr = 0.0; var fro = 0.0
    for (j <- 0 until d; k <- j until d) {
      val c = vecs.map(v => (v(j) - mean(j)) * (v(k) - mean(k))).sum / (n - 1)
      if (j == k) { tr += c; fro += c * c } else fro += 2 * c * c
    }
    assert(math.abs(pr - tr * tr / fro) < 1e-6, s"$pr vs ${tr * tr / fro}")
  }

  test("histogram entropy: bounded by log2(levels), solid image would be zero") {
    val rows = graft.operators.Multimodal.histogramEntropy(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, np, lv, h) =>
      assert(h >= -1e-12 && h <= math.log(lv.toDouble) / math.log(2.0) + 1e-9,
        s"doc $id entropy $h levels $lv")
      assert(np >= lv)
    }
  }

  test("seasonal MK: 12 seasons, |S| bounded by year pairs, variance nonnegative") {
    val rows = Relational13.seasonalMk(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1L to 12L))
    rows.foreach { case (_, ny, s, v18) =>
      assert(math.abs(s) <= ny * (ny - 1) / 2)
      assert(v18 >= 0)
    }
  }
}
