package graft.operators

import graft.Tables
import graft.functions.Exact.{dec, decToDouble, decToDoubleSql, decToDoubleSigned,
  decToDoubleSignedSql, discPrice}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-14 third wave: inference and forecasting diagnostics — Welch's
  * unequal-variance t-test, intraclass correlation (reliability), the
  * Syntetos–Boylan intermittent-demand classification, and a
  * lag-1 Granger-causality F-test, all in the house exact-integer +
  * portable-rounding conventions.
  */
object Relational15 {

  private val d38 = DecimalType(38, 0)

  /** Whole currency units — the extremeValue / durbinWatson envelope
    * rule: means and their differences must fit the DECIMAL(24,12)
    * portable rounding at any SF. The revenue sum is a NONNEGATIVE
    * exact decimal (scale 6), so the long cast's toward-zero fraction
    * truncation equals the oracle's `// 1000000` floor of micros.
    */
  private def wholeUnits(rev: Column): Column = rev.cast("long")

  // ------------------------------------------------------ Welch t-test

  /** Welch's unequal-variance t-test of per-customer revenue between
    * the BUILDING segment and everyone else — the two-sample mean
    * comparison [[Relational11.effectSize]] sizes and
    * [[Relational14.leveneBf]] justifies (Welch does NOT assume the
    * homogeneity BF tests, so it is the safe default). Per-group exact
    * DECIMAL(38,0) power sums of whole-unit revenue; t and the
    * Welch–Satterthwaite df are fixed double formulas of those sums
    * via the hi/lo split, identical trees both engines, 12-dec.
    */
  def welchTtest(t: Tables): DataFrame = {
    val per = t.orders
      .groupBy("o_custkey")
      .agg(expr("CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) " +
        "* 1000000 AS DECIMAL(38,0)) div 1000000 AS BIGINT)").as("x"))
      .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select((col("c_mktsegment") === "BUILDING").as("g"), col("x"))
    val byG = per.groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("s"),
        sum(col("x").cast(d38) * col("x")).as("q"))
    val a = byG.where(col("g")).select(col("n").as("n1"), col("s").as("s1"),
      col("q").as("q1"))
    val b = byG.where(!col("g")).select(col("n").as("n0"), col("s").as("s0"),
      col("q").as("q0"))
    def mean(s: Column, n: Column): Column = decToDouble(s) / n
    def varN(q: Column, s: Column, n: Column): Column =
      (decToDouble(q) - decToDouble(s) * decToDouble(s) / n) / (n - 1)
    a.crossJoin(b)
      .select(col("n1").cast("long").as("n_treat"),
        col("n0").cast("long").as("n_ctrl"),
        mean(col("s1"), col("n1")).as("m1"),
        mean(col("s0"), col("n0")).as("m0"),
        (varN(col("q1"), col("s1"), col("n1")) / col("n1")).as("se1"),
        (varN(col("q0"), col("s0"), col("n0")) / col("n0")).as("se0"),
        col("n1"), col("n0"))
      .select(col("n_treat"), col("n_ctrl"),
        (col("m1") - col("m0")).cast(DecimalType(24, 12)).cast("double")
          .as("mean_diff"),
        ((col("m1") - col("m0")) / sqrt(col("se1") + col("se0")))
          .cast(DecimalType(24, 12)).cast("double").as("t_welch"),
        (((col("se1") + col("se0")) * (col("se1") + col("se0"))) /
          (col("se1") * col("se1") / (col("n1") - 1) +
            col("se0") * col("se0") / (col("n0") - 1)))
          .cast(DecimalType(24, 12)).cast("double").as("df_ws"))
  }

  val welchTtestSql: String = {
    def m(s: String, n: String) = s"${decToDoubleSql(s)} / $n"
    def v(q: String, s: String, n: String) =
      s"(${decToDoubleSql(q)} - ${decToDoubleSql(s)} * ${decToDoubleSql(s)} / $n) / ($n - 1)"
    s"""WITH per AS (
       | SELECT c_mktsegment = 'BUILDING' AS g,
       |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 1000000
       |    AS HUGEINT) // 1000000 AS BIGINT) AS x
       | FROM orders JOIN customer ON o_custkey = c_custkey
       | GROUP BY g, o_custkey),
       |by_g AS (
       | SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(x) AS HUGEINT) AS s,
       |  CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
       | FROM per GROUP BY 1),
       |ab AS (
       | SELECT
       |  (SELECT n FROM by_g WHERE g) AS n1,
       |  (SELECT s FROM by_g WHERE g) AS s1,
       |  (SELECT q FROM by_g WHERE g) AS q1,
       |  (SELECT n FROM by_g WHERE NOT g) AS n0,
       |  (SELECT s FROM by_g WHERE NOT g) AS s0,
       |  (SELECT q FROM by_g WHERE NOT g) AS q0),
       |se AS (
       | SELECT n1, n0,
       |  ${m("s1", "n1")} AS m1, ${m("s0", "n0")} AS m0,
       |  ${v("q1", "s1", "n1")} / n1 AS se1,
       |  ${v("q0", "s0", "n0")} / n0 AS se0
       | FROM ab)
       |SELECT n1 AS n_treat, n0 AS n_ctrl,
       | CAST(CAST(m1 - m0 AS DECIMAL(24,12)) AS DOUBLE) AS mean_diff,
       | CAST(CAST((m1 - m0) / sqrt(se1 + se0) AS DECIMAL(24,12)) AS DOUBLE)
       |   AS t_welch,
       | CAST(CAST(((se1 + se0) * (se1 + se0)) /
       |   (se1 * se1 / (n1 - 1) + se0 * se0 / (n0 - 1))
       |   AS DECIMAL(24,12)) AS DOUBLE) AS df_ws
       |FROM se""".stripMargin
  }

  // ------------------------------------------------------------- ICC

  /** One-way random-effects intraclass correlation ICC(1) of monthly
    * revenue across brands — "how much of month-to-month variance is a
    * stable BRAND effect", the reliability coefficient behind any
    * per-entity score the pipeline reuses across periods. Balanced
    * design enforced explicitly: only months observed for EVERY brand
    * enter (dims-bounded semi-join). MS_between/MS_within come from
    * exact DECIMAL(38,0) power sums (whole units) with the per-brand
    * term folded in brand order; ICC = (MSB−MSW)/(MSB+(k−1)·MSW).
    */
  def icc(t: Tables): DataFrame = {
    val cell = t.lineitem
      .join(t.part.select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), trunc(col("l_shipdate"), "month").as("mon"))
      .agg(wholeUnits(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
        .cast("long").as("x"))
    val nBrands = t.part.select("p_brand").distinct().count()
    val complete = cell.groupBy("mon").agg(count(lit(1)).as("nb"))
      .where(col("nb") === nBrands).select("mon")
    val bal = cell.join(broadcast(complete), Seq("mon"))
    val byBrand = bal.groupBy("p_brand")
      .agg(count(lit(1)).as("k"),
        sum(col("x").cast(d38)).as("s"),
        sum(col("x").cast(d38) * col("x")).as("q"))
    val gterm = decToDouble(col("s")) * decToDouble(col("s")) /
      col("k").cast("double")
    byBrand
      .agg(count(lit(1)).as("n_brands"),
        first(col("k")).as("k"),
        sum(col("s")).cast(d38).as("s_all"),
        sum(col("q")).cast(d38).as("q_all"),
        sort_array(collect_list(struct(col("p_brand"), gterm.as("term"))))
          .as("arr"))
      .select(col("n_brands").cast("long").as("n_brands"),
        col("k").cast("long").as("k_months"),
        col("s_all"), col("q_all"),
        expr("aggregate(slice(arr, 2, size(arr) - 1), arr[0].term," +
          " (a, x) -> a + x.term)").as("tsum"))
      .select(col("n_brands"), col("k_months"),
        ((col("tsum") - decToDouble(col("s_all")) * decToDouble(col("s_all")) /
          (col("n_brands") * col("k_months")).cast("double")) /
          (col("n_brands") - 1).cast("double")).as("msb"),
        ((decToDouble(col("q_all")) - col("tsum")) /
          (col("n_brands").cast("double") * (col("k_months") - 1).cast("double")))
          .as("msw"),
        col("k_months").as("km2"))
      // only DIMENSIONLESS outputs: the mean squares are units² and grow
      // as SF², overflowing the 12-integer-digit portable rounding
      .select(col("n_brands"), col("k_months"),
        (col("msb") / col("msw"))
          .cast(DecimalType(24, 12)).cast("double").as("f_ratio"),
        ((col("msb") - col("msw")) /
          (col("msb") + (col("km2") - 1).cast("double") * col("msw")))
          .cast(DecimalType(24, 12)).cast("double").as("icc1"))
  }

  val iccSql: String = {
    val sAllD = decToDoubleSql("s_all")
    val qAllD = decToDoubleSql("q_all")
    val sD = decToDoubleSql("s")
    s"""WITH cell AS (
       | SELECT p_brand, date_trunc('month', CAST(l_shipdate AS DATE)) AS mon,
       |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
       |    CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4)))
       |    * 1000000 AS HUGEINT) // 1000000 AS BIGINT) AS x
       | FROM lineitem JOIN part ON l_partkey = p_partkey
       | GROUP BY 1, 2),
       |nb AS (SELECT CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n FROM part),
       |complete AS (
       | SELECT mon FROM cell GROUP BY mon
       | HAVING COUNT(*) = (SELECT n FROM nb)),
       |bal AS (SELECT cell.* FROM cell JOIN complete USING (mon)),
       |by_brand AS (
       | SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS k,
       |  CAST(SUM(x) AS HUGEINT) AS s,
       |  CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
       | FROM bal GROUP BY 1),
       |folded AS (
       | SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
       |  CAST(MIN(k) AS BIGINT) AS k_months,
       |  CAST(SUM(s) AS HUGEINT) AS s_all,
       |  CAST(SUM(q) AS HUGEINT) AS q_all,
       |  list_reduce(list($sD * $sD / CAST(k AS DOUBLE) ORDER BY p_brand),
       |    (a, x) -> a + x) AS tsum
       | FROM by_brand),
       |ms AS (
       | SELECT n_brands, k_months,
       |  (tsum - $sAllD * $sAllD / CAST(n_brands * k_months AS DOUBLE)) /
       |    CAST(n_brands - 1 AS DOUBLE) AS msb,
       |  ($qAllD - tsum) /
       |    (CAST(n_brands AS DOUBLE) * CAST(k_months - 1 AS DOUBLE)) AS msw
       | FROM folded)
       |SELECT n_brands, k_months,
       | CAST(CAST(msb / msw AS DECIMAL(24,12)) AS DOUBLE) AS f_ratio,
       | CAST(CAST((msb - msw) / (msb + CAST(k_months - 1 AS DOUBLE) * msw)
       |   AS DECIMAL(24,12)) AS DOUBLE) AS icc1
       |FROM ms""".stripMargin
  }

  // ------------------------------------- intermittent-demand classes

  /** Syntetos–Boylan cutoffs: ADI 1.32 (×100 as integer hundredths),
    * CV² 0.49. */
  private val AdiCut100 = 132L
  private val Cv2Cut = 0.49

  /** Syntetos–Boylan intermittent-demand classification per part —
    * ADI (average inter-demand interval, here span-months over
    * demand-months) × CV² of the nonzero monthly demand, cut at
    * (1.32, 0.49) into smooth / intermittent / erratic / lumpy: the
    * routing decision between Croston-style and standard forecasting
    * that [[TimeSeries.forecastBacktest]] assumes away. The month
    * span is each part's OWN first→last demand month (calendar
    * arithmetic, exact); ADI compares as exact integers scaled ×100;
    * CV² is one double formula of DECIMAL(38,0) sums, 12-dec. Output
    * is the class census per brand (dims-bounded) so the frame stays
    * small at any corpus.
    */
  def demandClasses(t: Tables): DataFrame = {
    val monthly = t.lineitem
      .join(t.part.select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_partkey").as("pk"),
        trunc(col("l_shipdate"), "month").as("mon"))
      .agg((sum(dec(col("l_quantity"))) * 100).cast("long").as("d"))
    val perPart = monthly.groupBy("p_brand", "pk")
      .agg(count(lit(1)).as("nz"),
        (months_between(max(col("mon")), min(col("mon"))).cast("long") + 1)
          .as("span"),
        sum(col("d").cast(d38)).as("s"),
        sum(col("d").cast(d38) * col("d")).as("q"))
      .withColumn("cv2",
        // CV² = n·Σd²/(Σd)² − 1 over the NONZERO demands
        (col("nz") * decToDouble(col("q")) /
          (decToDouble(col("s")) * decToDouble(col("s"))) - lit(1.0)))
      .withColumn("cls",
        when(col("span") * 100 <= col("nz") * AdiCut100,
          when(col("cv2") <= Cv2Cut, "smooth").otherwise("erratic"))
          .otherwise(
            when(col("cv2") <= Cv2Cut, "intermittent").otherwise("lumpy")))
    perPart.groupBy("p_brand", "cls")
      .agg(count(lit(1)).as("n_parts"),
        graft.functions.Exact.portableMean(col("cv2")).as("avg_cv2"))
      .orderBy("p_brand", "cls")
  }

  val demandClassesSql: String = {
    val sD = decToDoubleSql("s")
    val qD = decToDoubleSql("q")
    s"""WITH monthly AS (
       | SELECT p_brand, l_partkey AS pk,
       |  date_trunc('month', CAST(l_shipdate AS DATE)) AS mon,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT) AS d
       | FROM lineitem JOIN part ON l_partkey = p_partkey
       | GROUP BY 1, 2, 3),
       |per_part AS (
       | SELECT p_brand, pk, CAST(COUNT(*) AS BIGINT) AS nz,
       |  CAST(date_diff('month', MIN(mon), MAX(mon)) AS BIGINT) + 1 AS span,
       |  CAST(SUM(d) AS HUGEINT) AS s,
       |  CAST(SUM(CAST(d AS HUGEINT) * d) AS HUGEINT) AS q
       | FROM monthly GROUP BY 1, 2),
       |cls AS (
       | SELECT p_brand,
       |  nz * $qD / ($sD * $sD) - 1.0 AS cv2,
       |  CASE WHEN span * 100 <= nz * $AdiCut100
       |       THEN CASE WHEN nz * $qD / ($sD * $sD) - 1.0 <= $Cv2Cut
       |                 THEN 'smooth' ELSE 'erratic' END
       |       ELSE CASE WHEN nz * $qD / ($sD * $sD) - 1.0 <= $Cv2Cut
       |                 THEN 'intermittent' ELSE 'lumpy' END END AS cls
       | FROM per_part)
       |SELECT p_brand, cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
       | CAST(CAST(CAST(SUM(CAST(cv2 AS DECIMAL(38,30))) AS DOUBLE) / COUNT(*)
       |   AS DECIMAL(24,12)) AS DOUBLE) AS avg_cv2
       |FROM cls GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ------------------------------------------------ Granger causality

  /** Lag-1 Granger-causality F-test: does YESTERDAY'S order-line count
    * improve the prediction of TODAY'S revenue beyond yesterday's
    * revenue alone — the predictive-precedence screen behind
    * [[Relational12.crossCorrelation]]'s symmetric lag view.
    * Restricted (xₜ ~ xₜ₋₁) and unrestricted (xₜ ~ xₜ₋₁ + yₜ₋₁) OLS
    * both close over centered second moments of the calendar-adjacent
    * pair frame (gap days yield no pair, one bounded-day-domain
    * self-join); the 2×2 normal equations solve in closed form.
    * Every moment is an exact DECIMAL(38,0) sum of whole-unit ×
    * count products; the centered moments, coefficients, RSS ratio
    * and F evaluate in ONE double expression tree per engine, with
    * the coefficients and F 12-dec rounded at the output seam.
    */
  def grangerLag1(t: Tables): DataFrame = {
    val daily = t.lineitem
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(wholeUnits(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
          .cast("long").as("x"),
        count(lit(1)).as("y"))
      .select(datediff(col("d"), to_date(lit("1970-01-01"))).as("ed"),
        col("x"), col("y"))
      .localCheckpoint(true) // both pair sides
    val prev = daily.select(col("ed").as("pd"), col("x").as("x1"),
      col("y").as("y1"))
    val pairs = daily.join(broadcast(prev), col("ed") === col("pd") + 1)
    val mom = pairs.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(d38)).as("sx"),
      sum(col("x1").cast(d38)).as("sa"),
      sum(col("y1").cast(d38)).as("sb"),
      sum(col("x").cast(d38) * col("x")).as("sxx"),
      sum(col("x1").cast(d38) * col("x1")).as("saa"),
      sum(col("y1").cast(d38) * col("y1")).as("sbb"),
      sum(col("x").cast(d38) * col("x1")).as("sxa"),
      sum(col("x").cast(d38) * col("y1")).as("sxb"),
      sum(col("x1").cast(d38) * col("y1")).as("sab"))
    // centered moments (doubles of exact sums — identical trees)
    val n = col("n").cast("double")
    def c2(spq: Column, sp: Column, sq: Column): Column =
      decToDouble(spq) - decToDoubleSigned(sp) * decToDoubleSigned(sq) / n
    val cxx = c2(col("sxx"), col("sx"), col("sx"))
    val caa = c2(col("saa"), col("sa"), col("sa"))
    val cbb = c2(col("sbb"), col("sb"), col("sb"))
    val cxa = c2(col("sxa"), col("sx"), col("sa"))
    val cxb = c2(col("sxb"), col("sx"), col("sb"))
    val cab = c2(col("sab"), col("sa"), col("sb"))
    val det = caa * cbb - cab * cab
    val bU = (cxa * cbb - cxb * cab) / det
    val cU = (cxb * caa - cxa * cab) / det
    val rssR = cxx - cxa * cxa / caa
    val rssU = cxx - (bU * cxa + cU * cxb)
    mom.select(col("n").cast("long").as("n_pairs"),
      bU.cast(DecimalType(24, 12)).cast("double").as("beta_lag_rev"),
      cU.cast(DecimalType(24, 12)).cast("double").as("beta_lag_cnt"),
      ((rssR - rssU) * (n - 3) / rssU)
        .cast(DecimalType(24, 12)).cast("double").as("f_granger"))
  }

  val grangerLag1Sql: String = {
    def c2(spq: String, sp: String, sq: String): String =
      s"(${decToDoubleSql(spq)} - ${decToDoubleSignedSql(sp)} * " +
        s"${decToDoubleSignedSql(sq)} / CAST(n AS DOUBLE))"
    val cxx = c2("sxx", "sx", "sx")
    val caa = c2("saa", "sa", "sa")
    val cbb = c2("sbb", "sb", "sb")
    val cxa = c2("sxa", "sx", "sa")
    val cxb = c2("sxb", "sx", "sb")
    val cab = c2("sab", "sa", "sb")
    s"""WITH daily AS (
       | SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
       |   AS ed,
       |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
       |    CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4)))
       |    * 1000000 AS HUGEINT) // 1000000 AS BIGINT) AS x,
       |  CAST(COUNT(*) AS BIGINT) AS y
       | FROM lineitem GROUP BY 1),
       |pairs AS (
       | SELECT a.x AS x, b.x AS x1, b.y AS y1
       | FROM daily a JOIN daily b ON a.ed = b.ed + 1),
       |mom AS (
       | SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(x1) AS HUGEINT) AS sa,
       |  CAST(SUM(y1) AS HUGEINT) AS sb,
       |  CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
       |  CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS saa,
       |  CAST(SUM(CAST(y1 AS HUGEINT) * y1) AS HUGEINT) AS sbb,
       |  CAST(SUM(CAST(x AS HUGEINT) * x1) AS HUGEINT) AS sxa,
       |  CAST(SUM(CAST(x AS HUGEINT) * y1) AS HUGEINT) AS sxb,
       |  CAST(SUM(CAST(x1 AS HUGEINT) * y1) AS HUGEINT) AS sab
       | FROM pairs),
       |sol AS (
       | SELECT n,
       |  ($cxa * $cbb - $cxb * $cab) / ($caa * $cbb - $cab * $cab) AS b_u,
       |  ($cxb * $caa - $cxa * $cab) / ($caa * $cbb - $cab * $cab) AS c_u,
       |  $cxx - $cxa * $cxa / $caa AS rss_r,
       |  $cxx AS cxx, $cxa AS cxa, $cxb AS cxb
       | FROM mom)
       |SELECT n AS n_pairs,
       | CAST(CAST(b_u AS DECIMAL(24,12)) AS DOUBLE) AS beta_lag_rev,
       | CAST(CAST(c_u AS DECIMAL(24,12)) AS DOUBLE) AS beta_lag_cnt,
       | CAST(CAST((rss_r - (cxx - (b_u * cxa + c_u * cxb)))
       |   * (CAST(n AS DOUBLE) - 3) / (cxx - (b_u * cxa + c_u * cxb))
       |   AS DECIMAL(24,12)) AS DOUBLE) AS f_granger
       |FROM sol""".stripMargin
  }
}
