package graft

import graft.functions.{KllIn, KllOps, KllPartial, KllPartialIn, KllState}
import graft.operators.Relational3
import org.apache.spark.sql.functions._

/** Round-16 additions: the KLL-family mergeable quantile sketch.
  *
  * Pins the three properties that make [[Relational3.sketchQuantiles]]
  * sound at any rollup depth:
  *  1. the state is a pure function of the input MULTISET (any arrival
  *     order, any partitioning, any merge tree → identical state);
  *  2. the lossless-merge identity merge(sk(A), sk(B)) = sk(A ∪ B) holds
  *     EXACTLY, including through Spark's two-level Aggregator path;
  *  3. the retained sample's quantiles land within the uniform-sample
  *     rank-error bound of the exact percentiles.
  */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  private val Cap = 256

  /** (rowHash, cents) for every sf0.001 lineitem — the raw multiset. */
  private lazy val rows: Vector[(Long, Long)] = {
    val h = graft.functions.PortableHash.hash60 _
    sf.lineitem
      .select(
        h(concat_ws("#", col("l_orderkey"), col("l_linenumber"))).as("h"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"))
      .as[(Long, Long)].collect().toVector
  }

  private def build(rs: Seq[(Long, Long)]): KllState =
    rs.foldLeft(KllState(0, Vector.empty)) { case (st, (h, c)) =>
      KllOps.insert(Cap)(st, h, c)
    }

  test("kll state is a pure function of the multiset: order-independent") {
    val direct = build(rows)
    assert(direct.cut > 0, "planted data must force at least one raise")
    assert(direct.items.nonEmpty && direct.items.length <= Cap)
    assert(build(rows.reverse) == direct)
    assert(build(rows.sortBy(_._2)) == direct)
  }

  test("lossless merge identity: merge(sk(A), sk(B)) = sk(A U B), any tree") {
    val direct = build(rows)
    // partition the multiset 7 ways, sketch each part, merge two ways
    val parts = rows.zipWithIndex.groupBy(_._2 % 7).toSeq.sortBy(_._1)
      .map { case (_, xs) => build(xs.map(_._1)) }
    val leftFold = parts.reduceLeft(KllOps.merge(Cap))
    val pairTree = parts.grouped(2)
      .map(g => g.reduceLeft(KllOps.merge(Cap)))
      .reduceLeft(KllOps.merge(Cap))
    assert(leftFold == direct, "left-fold merge must equal direct build")
    assert(pairTree == direct, "pair-tree merge must equal direct build")
    // wire round-trip (what the level-2 aggregation actually ships)
    assert(KllOps.fromWire(KllOps.toWire(direct)) == direct)
  }

  test("two-level Aggregator path equals the multiset function under any partitioning") {
    val h = graft.functions.PortableHash.hash60 _
    val src = sf.lineitem.select(
      (col("l_suppkey") % 7).as("g"),
      h(concat_ws("#", col("l_orderkey"), col("l_linenumber"))).as("rh"),
      (col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long").as("cents"))
    val partial = udaf(new KllPartial(Cap),
      org.apache.spark.sql.Encoders.product[KllIn])
    val merged = udaf(new graft.functions.KllMergeAgg(Cap),
      org.apache.spark.sql.Encoders.product[KllPartialIn])
    def rollup(parts: Int) = src.repartition(parts)
      .groupBy("g").agg(partial(col("rh"), col("cents")).as("kll"))
      .agg(merged(col("kll")).as("q"))
      .select("q.m", "q.cut", "q.n_est", "q.p50_price", "q.p90_price")
      .as[(Long, Int, Long, Double, Double)].head()
    val expected = {
      val o = KllOps.finish(build(rows))
      (o.m, o.cut, o.n_est, o.p50_price, o.p90_price)
    }
    assert(rollup(1) == expected)
    assert(rollup(13) == expected, "shuffle-partitioning must not change the state")
  }

  test("quantile estimates respect the uniform-sample rank-error bound") {
    val st = build(rows)
    val out = KllOps.finish(st)
    val exact = rows.map(_._2).sorted
    val n = exact.length
    // rank of the estimate within the EXACT data, as a fraction
    def rankOf(dollars: Double): Double =
      exact.count(_ <= math.round(dollars * 100)).toDouble / n
    // m retained Bernoulli samples: |rank - p| <~ 1.36/sqrt(m) whp
    // (DKW at 95%); deterministic data, so this never flakes
    val tol = 1.36 / math.sqrt(out.m.toDouble)
    assert(math.abs(rankOf(out.p50_price) - 0.5) <= tol,
      s"p50 rank ${rankOf(out.p50_price)} vs 0.5 (tol $tol, m=${out.m})")
    assert(math.abs(rankOf(out.p90_price) - 0.9) <= tol,
      s"p90 rank ${rankOf(out.p90_price)} vs 0.9 (tol $tol, m=${out.m})")
    // HT total estimate: within the same multiplicative band of n
    assert(math.abs(out.n_est.toDouble / n - 1.0) <= 3.0 / math.sqrt(out.m.toDouble),
      s"n_est ${out.n_est} vs n $n")
  }

  test("q_sketch_quantiles: one row per region, sane sketch columns") {
    val df = Relational3.sketchQuantiles(sf)
    val rs = df.collect()
    assert(rs.length == 5)
    rs.foreach { r =>
      val m = r.getAs[Long]("m")
      val cut = r.getAs[Int]("cut")
      val nEst = r.getAs[Long]("n_est")
      assert(m > 0 && m <= 512)
      assert(nEst == (m << cut))
      assert(r.getAs[Double]("p50_price") > 0)
      assert(r.getAs[Double]("p90_price") >= r.getAs[Double]("p50_price"))
    }
  }
}
