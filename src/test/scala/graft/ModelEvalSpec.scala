package graft

import graft.operators.ModelEval
import org.apache.spark.sql.functions._

/** Model-evaluation / drift tier (round 17): PR-AUC, calibration/ECE,
  * PSI, pinball loss, NDCG@10.
  *
  * Strategy: every operator gets (a) structural invariants that must
  * hold for ANY input, and (b) where feasible, an independent
  * brute-force recomputation in plain Scala over the collected sf0.001
  * rows — a second implementation of the math, not a replay of the
  * plan. The DuckDB oracle is the third, cross-engine leg.
  */
class ModelEvalSpec extends SparkSpec {

  private lazy val orderRows: Vector[(Long, Long)] =
    sf.orders.select(
        (col("o_totalprice").cast("decimal(12,2)") * 1000000)
          .cast("long").as("u"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          .cast("long").as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector

  test("pr_auc matches a brute-force average-precision replay") {
    val row = ModelEval.prAuc(sf).collect().head
    val nPos = row.getAs[Long]("n_pos")
    val nNeg = row.getAs[Long]("n_neg")
    val auc = row.getAs[Double]("pr_auc")
    assert(nPos + nNeg == orderRows.size)
    assert(nPos == orderRows.count(_._2 == 1L))
    assert(auc > 0.0 && auc <= 1.0)

    // independent: bucket -> (c, cp), thresholds desc, step-AP
    val buckets = orderRows.groupBy(_._1 / 1000000000L).toSeq
      .map { case (kb, xs) => (kb, xs.size.toLong, xs.map(_._2).sum) }
      .sortBy(-_._1)
    var tp = 0L; var nn = 0L; var ap = 0.0
    buckets.foreach { case (_, c, cp) =>
      tp += cp; nn += c
      ap += cp.toDouble * tp / (nPos.toDouble * nn)
    }
    assert(math.abs(auc - ap) < 1e-9, s"spark $auc vs replay $ap")
    // prevalence is the positive rate
    assert(math.abs(row.getAs[Double]("prevalence") -
      nPos.toDouble / orderRows.size) < 1e-9)
  }

  test("calibration bins partition the data; ECE is the weighted gap sum") {
    val rows = ModelEval.calibrationEce(sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getAs[Long]("n_b")).sum == orderRows.size)
    val bins = rows.map(_.getAs[Long]("bin"))
    assert(bins.distinct.length == bins.length)
    assert(bins.forall(b => b >= 0 && b <= 9))
    rows.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      val conf = r.getAs[Double]("confidence")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(conf >= 0.0 && conf <= 1.0)
      assert(math.abs(r.getAs[Double]("gap") - (acc - conf)) < 1e-9)
    }
    val n = orderRows.size.toDouble
    val expected = rows.map(r =>
      r.getAs[Long]("n_b") / n * math.abs(r.getAs[Double]("gap"))).sum
    val ece = rows.head.getAs[Double]("ece")
    assert(rows.forall(r => r.getAs[Double]("ece") == ece), "scalar repeats")
    assert(math.abs(ece - expected) < 1e-9)
    assert(ece >= 0.0 && ece <= 1.0)
  }

  test("psi is nonnegative with nonnegative terms and counts both periods") {
    val rows = ModelEval.psiDrift(sf).collect()
    assert(rows.nonEmpty)
    val psi = rows.head.getAs[Double]("psi")
    assert(rows.forall(r => r.getAs[Double]("psi") == psi))
    // (p-q)ln(p/q) >= 0 term-wise: both factors share a sign
    rows.foreach(r => assert(r.getAs[Double]("term") >= -1e-12))
    assert(psi >= 0.0)
    val total = rows.map(r =>
      r.getAs[Long]("n_base") + r.getAs[Long]("n_curr")).sum
    assert(total == orderRows.size)
    assert(math.abs(psi - rows.map(_.getAs[Double]("term")).sum) < 1e-9)
  }

  test("pinball loss: tau=0.5 is half the MAE; coverage in [0,1]") {
    val rows = ModelEval.pinballLoss(sf).collect().sortBy(_.getAs[Double]("tau"))
    assert(rows.map(_.getAs[Double]("tau")).toSeq == Seq(0.5, 0.9))
    assert(rows.forall(_.getAs[Long]("n_days") > 0))
    assert(rows(0).getAs[Long]("n_days") == rows(1).getAs[Long]("n_days"))
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_pinball") >= 0.0)
      val cov = r.getAs[Double]("coverage")
      assert(cov >= 0.0 && cov <= 1.0)
    }
    // independent daily-series replay: micros rollup, d-7 join, exact loss
    val daily = sf.lineitem
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg((sum((col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1) - col("l_discount").cast("decimal(4,2)"))
          .cast("decimal(8,4)"))) * 1000000).cast("decimal(38,0)")
        .cast("long").as("y"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val pairs = daily.toSeq.flatMap { case (d, y) =>
      daily.get(d.minusDays(7)).map(yhat => (y, yhat))
    }
    assert(pairs.size == rows(0).getAs[Long]("n_days"))
    val mae = pairs.map { case (y, f) => math.abs(y - f).toDouble }.sum /
      (pairs.size * 1e6)
    assert(math.abs(rows(0).getAs[Double]("mean_pinball") - 0.5 * mae) < 1e-6)
  }

  test("roc points: monotone rates, endpoints reach (1,1), precision sane") {
    val rows = ModelEval.rocPoints(sf).collect()
      .sortBy(_.getAs[Long]("threshold_k"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("tpr", "fpr", "precision").foreach { cName =>
        val v = r.getAs[Double](cName)
        assert(v >= 0.0 && v <= 1.0, s"$cName=$v")
      }
    }
    // descending threshold order = ascending tpr/fpr: the lowest
    // threshold includes everything
    val lowest = rows.head
    assert(lowest.getAs[Double]("tpr") == 1.0)
    assert(lowest.getAs[Double]("fpr") == 1.0)
    val tprs = rows.reverse.map(_.getAs[Double]("tpr"))
    assert(tprs.zip(tprs.tail).forall { case (a, b) => a <= b + 1e-12 },
      "tpr monotone as threshold drops")
  }

  test("gains curve: capture/lift consistent with pr_auc machinery") {
    val rows = ModelEval.gainsCurve(sf).collect()
      .sortBy(_.getAs[Long]("threshold_k"))
    val nPos = orderRows.count(_._2 == 1L)
    val prevalence = nPos.toDouble / orderRows.size
    rows.foreach { r =>
      val share = r.getAs[Double]("target_share")
      val cap = r.getAs[Double]("capture_rate")
      val lift = r.getAs[Double]("lift")
      assert(share > 0.0 && share <= 1.0)
      assert(cap >= 0.0 && cap <= 1.0)
      // (tp/n1)/(nn/n) = tp·n/(n1·nn): lift IS capture/share
      assert(math.abs(lift - cap / share) < 1e-6)
      assert(lift <= 1.0 / prevalence + 1e-9)
    }
    // full-population row: share 1, capture 1, lift 1
    val full = rows.head
    assert(full.getAs[Double]("target_share") == 1.0)
    assert(full.getAs[Double]("capture_rate") == 1.0)
    assert(math.abs(full.getAs[Double]("lift") - 1.0) < 1e-9)
  }

  test("brier decomposition: identity holds and matches binned replay") {
    val row = ModelEval.brierDecomposition(sf).collect().head
    val rel = row.getAs[Double]("reliability")
    val res = row.getAs[Double]("resolution")
    val unc = row.getAs[Double]("uncertainty")
    val brier = row.getAs[Double]("brier")
    assert(rel >= 0.0 && res >= 0.0)
    assert(unc >= 0.0 && unc <= 0.25 + 1e-12)
    assert(math.abs(brier - (rel - res + unc)) < 1e-9)
    // resolution cannot exceed uncertainty; brier stays in [0, 1]
    assert(res <= unc + 1e-9)
    assert(brier >= 0.0 && brier <= 1.0)
    // replay from the committed calibration frame
    val bins = ModelEval.calibrationEce(sf).collect()
    val n = orderRows.size.toDouble
    val ybar = orderRows.count(_._2 == 1L) / n
    val relB = bins.map { b =>
      val g = b.getAs[Double]("gap"); b.getAs[Long]("n_b") / n * g * g
    }.sum
    val resB = bins.map { b =>
      val d = b.getAs[Double]("accuracy") - ybar
      b.getAs[Long]("n_b") / n * d * d
    }.sum
    assert(math.abs(rel - relB) < 1e-9)
    assert(math.abs(res - resB) < 1e-6)
  }

  test("forecast_dm: sign counts + exact mean losses from a scala replay") {
    val row = ModelEval.forecastDm(sf).collect().head
    val n = row.getAs[Long]("n_days")
    assert(n > 0)
    assert(row.getAs[Long]("n_week_better") +
      row.getAs[Long]("n_day_better") <= n)
    // replay: same micros daily series, both lags, unit floors
    val daily = sf.lineitem
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg((sum((col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1) - col("l_discount").cast("decimal(4,2)"))
          .cast("decimal(8,4)"))) * 1000000).cast("decimal(38,0)")
        .cast("long").as("y"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val trip = daily.toSeq.flatMap { case (d, y) =>
      for {
        a <- daily.get(d.minusDays(7))
        b <- daily.get(d.minusDays(1))
      } yield (math.abs(y - a) / 1000000L, math.abs(y - b) / 1000000L)
    }
    assert(trip.size == n)
    val meanA = trip.map(_._1).sum.toDouble / n
    val meanB = trip.map(_._2).sum.toDouble / n
    assert(math.abs(row.getAs[Double]("mean_loss_week") - meanA) < 1e-5)
    assert(math.abs(row.getAs[Double]("mean_loss_day") - meanB) < 1e-5)
    assert(trip.count { case (a, b) => a < b } ==
      row.getAs[Long]("n_week_better"))
    val dm = row.getAs[Double]("dm_stat")
    assert(!dm.isNaN && !dm.isInfinite)
  }

  test("psi_segmented: one row per segment, each psi >= 0, counts add up") {
    val rows = ModelEval.psiSegmented(sf).collect()
    val segs = rows.map(_.getAs[String]("segment"))
    assert(segs.distinct.length == segs.length && segs.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("psi") >= 0.0)
      assert(r.getAs[Long]("n_buckets") >= 1)
      assert(r.getAs[Long]("n_base") + r.getAs[Long]("n_curr") > 0)
    }
    // all orders land in exactly one (segment, period) cell
    assert(rows.map(r => r.getAs[Long]("n_base") + r.getAs[Long]("n_curr"))
      .sum == orderRows.size)
  }

  test("croston: smoothed size/interval replayed in scala for one part") {
    val rows = ModelEval.croston(sf).collect()
    assert(rows.length <= 25 && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") >= 5)
      assert(r.getAs[Double]("size_hat") > 0.0)
      assert(r.getAs[Double]("interval_hat") >= 1.0 - 1e-9)
      assert(math.abs(r.getAs[Double]("rate_hat") -
        r.getAs[Double]("size_hat") / r.getAs[Double]("interval_hat")) < 1e-9)
    }
    // replay the fold for the top part
    val top = rows.head
    val pk = top.getAs[Long]("p_partkey")
    val series = sf.lineitem
      .where(col("l_partkey") === pk)
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
        .as("q"))
      .orderBy("d")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getDouble(1)))
      .takeRight(64)
    val z = series.map(_._2).reduceLeft((a, x) => (x + 3.0 * a) / 4.0)
    val gaps = series.map(_._1.toEpochDay.toDouble)
      .sliding(2).map(w => w(1) - w(0)).toSeq
    val p = gaps.reduceLeft((a, x) => (x + 3.0 * a) / 4.0)
    assert(math.abs(top.getAs[Double]("size_hat") - z) < 1e-9)
    assert(math.abs(top.getAs[Double]("interval_hat") - p) < 1e-9)
  }

  test("tracking signal: CFE/MAD identity and alert flag are consistent") {
    val rows = ModelEval.trackingSignal(sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_days")
      val ts = r.getAs[Double]("tracking_signal")
      assert(n >= 1)
      // |TS| is bounded by n (MAD >= |CFE|/n)
      assert(math.abs(ts) <= n + 1e-9, s"ts=$ts n=$n")
      assert(r.getAs[Boolean]("alert") == (math.abs(ts) > 4.0),
        s"alert flag vs ts=$ts")
      assert(r.getAs[Double]("mad_units") >=
        math.abs(r.getAs[Double]("cfe_mean_units")) - 1e-6)
    }
    // months are unique and formatted
    val months = rows.map(_.getAs[String]("month"))
    assert(months.distinct.length == months.length)
    assert(months.forall(_.matches("\\d{4}-\\d{2}")))
  }

  test("ndcg@10: ideal ranking dominates, ndcg in (0,1], brute-force agrees") {
    val rows = ModelEval.ndcgAtK(sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dcg = r.getAs[Double]("dcg")
      val idcg = r.getAs[Double]("idcg")
      assert(dcg <= idcg + 1e-9, s"${r.getAs[String]("n_name")}: $dcg > $idcg")
      if (!r.isNullAt(r.fieldIndex("ndcg"))) {
        val nd = r.getAs[Double]("ndcg")
        assert(nd >= 0.0 && nd <= 1.0 + 1e-12)
      }
    }
    // brute force one nation end-to-end
    val cust = sf.customer.select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val spend = sf.orders
      .groupBy("o_custkey")
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 1000000)
        .cast("decimal(38,0)").cast("long").as("relu"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val nk0 = cust.head._2
    val inNation = cust.filter(_._2 == nk0)
      .map { case (ck, _, bal) => (ck, bal, spend.getOrElse(ck, 0L) / 1000000L) }
    val w = (1 to 10).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    def dcgOf(ranked: Seq[Long]): Double =
      ranked.take(10).zipWithIndex
        .map { case (rel, i) => rel.toDouble * w(i) }.sum
    val dcgB = dcgOf(inNation.sortBy { case (ck, bal, _) => (-bal, ck) }
      .map(_._3).toSeq)
    val idcgB = dcgOf(inNation.sortBy { case (ck, _, rel) => (-rel, ck) }
      .map(_._3).toSeq)
    val nName = sf.nation.where(col("n_nationkey") === nk0)
      .select("n_name").collect().head.getString(0)
    val row = rows.find(_.getAs[String]("n_name") == nName).get
    assert(math.abs(row.getAs[Double]("dcg") - dcgB) < 1e-6,
      s"dcg ${row.getAs[Double]("dcg")} vs $dcgB")
    assert(math.abs(row.getAs[Double]("idcg") - idcgB) < 1e-6)
  }
}
