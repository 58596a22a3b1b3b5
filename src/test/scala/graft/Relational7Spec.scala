package graft

import graft.operators.Relational7

class Relational7Spec extends SparkSpec {

  test("abc classes partition parts by cumulative revenue share") {
    val rows = Relational7.abcAnalysis(sf).collect()
    assert(rows.nonEmpty)
    // shares are monotone along the revenue-descending order and end at 1
    val shares = rows.map(_.getDouble(2))
    assert(shares.sliding(2).forall { case Array(a, b) => a <= b + 1e-12; case _ => true })
    assert(math.abs(shares.last - 1.0) < 1e-9)
    // class boundaries respect the thresholds
    rows.foreach { r =>
      val cls = r.getString(3); val share = r.getDouble(2)
      if (share <= 0.60) assert(cls == "A")
      else if (share <= 0.85) assert(cls == "B")
      else assert(cls == "C")
    }
    assert(rows.map(_.getString(3)).distinct.sorted.sameElements(Array("A", "B", "C")))
  }

  test("basket pairs count co-occurrence symmetrically and respect min support") {
    val rows = Relational7.basketPairs(sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be canonical (a < b)")
      assert(r.getLong(2) >= 3)
    }
    // recount one pair by hand
    if (rows.nonEmpty) {
      val (a, b, s) = (rows.head.getLong(0), rows.head.getLong(1), rows.head.getLong(2))
      val orders = sf.lineitem.select("l_orderkey", "l_partkey").distinct().collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
      val manual = orders.values.count(ps => ps.contains(a) && ps.contains(b))
      assert(manual.toLong == s)
    }
  }

  test("basket triples match a driver-side itemset recount") {
    val rows = graft.operators.Relational7.basketTriples(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    rows.keys.foreach { case (a, b, c) => assert(a < b && b < c) }
    rows.values.foreach(s => assert(s >= 2))
    val orders = sf.lineitem.select("l_orderkey", "l_partkey").distinct()
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val expect = orders.values.toSeq
      .flatMap(ps => ps.toSeq.sorted.combinations(3).map(t => (t(0), t(1), t(2))))
      .groupBy(x => x).view.mapValues(_.size.toLong).filter(_._2 >= 2).toMap
    assert(rows == expect, s"got ${rows.size} vs ${expect.size} triples")
  }

  test("basket lift matches the exact count replay and broadcasts the frequencies") {
    val orders = sf.lineitem.select("l_orderkey", "l_partkey").distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val n = orders.size.toLong
    val freq = orders.values.toSeq.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = Relational7.basketLift(sf).collect()
    val byPair = got.map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    byPair.foreach { case ((a, b), (s, conf, lift)) =>
      val manual = orders.values.count(ps => ps.contains(a) && ps.contains(b)).toLong
      assert(manual == s && s >= 3)
      assert(conf == s.toDouble / freq(a).toDouble)
      assert(lift == (s * n).toDouble / (freq(a) * freq(b)).toDouble)
    }
    // every qualifying pair is present
    val expectedPairs = orders.values.toSeq
      .flatMap(ps => ps.toSeq.sorted.combinations(2).map(c => (c(0), c(1))))
      .groupBy(identity).view.mapValues(_.size).filter(_._2 >= 3).keySet
    assert(byPair.keySet == expectedPairs)
    // the frequency sides join via broadcast, not a shuffled join
    val df = Relational7.basketLift(sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"), "freq joins must broadcast")
    // the part-frequency branch must ride the SAME basket shuffle as the
    // pair mining (identical subtree -> ReuseExchange), not re-gather it
    assert(plan.contains("ReusedExchange"), "basket exchange must be reused")
  }

  test("yoy growth compares each month to 12 months earlier") {
    val rows = Relational7.yoyGrowth(sf).collect()
    val byMonth = rows.map(r => r.getDate(0).toString -> r).toMap
    rows.foreach { r =>
      val month = r.getDate(0).toLocalDate
      val prior = month.minusYears(1).toString
      if (byMonth.contains(prior)) {
        assert(!r.isNullAt(2), s"month $month should see prior year $prior")
        val prev = byMonth(prior).getDouble(1)
        assert(r.getDouble(2) == prev)
        assert(r.getDouble(3) == (r.getDouble(1) - prev) / prev)
      }
    }
    // the first 12 months have no prior year
    assert(rows.take(12).forall(_.isNullAt(2)))
  }

  test("correlation matrix matches a driver-side exact recount") {
    val rows = Relational7.corrMatrix(sf).collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
    // recount one pair exactly with BigDecimal sums
    val data = sf.lineitem.select("l_quantity", "l_extendedprice").collect()
      .map(r => (BigDecimal(r.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val n = data.length.toDouble
    val sx = data.map(_._1).sum.toDouble; val sy = data.map(_._2).sum.toDouble
    val sxx = data.map(p => p._1 * p._1).sum.toDouble
    val syy = data.map(p => p._2 * p._2).sum.toDouble
    val sxy = data.map(p => p._1 * p._2).sum.toDouble
    val expect = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val got = rows.find(r => r.getString(0) == "l_extendedprice" && r.getString(1) == "l_quantity")
      .orElse(rows.find(r => r.getString(0) == "l_quantity" && r.getString(1) == "l_extendedprice"))
      .get.getDouble(2)
    assert(math.abs(got - expect) < 1e-9, s"got $got want $expect")
  }

  test("correlation power sums aggregate longs — no decimal-38 Sum in the plan") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
    import org.apache.spark.sql.types.LongType
    val qe = Relational7.corrMatrix(sf).queryExecution
    val sums = qe.optimizedPlan.collect { case a: Aggregate => a }
      .flatMap(_.aggregateExpressions)
      .flatMap(_.collect { case ae: AggregateExpression => ae.aggregateFunction })
      .collect { case s: Sum => s }
    assert(sums.nonEmpty)
    // every power sum runs on the unscaled-long fast path; the decimal
    // reconstruction happens once, on the single merged row, after the agg
    sums.foreach(s => assert(s.dataType == LongType, s"non-long sum: $s"))
  }

  test("2-D histogram cells partition all of lineitem and cap the quantity band") {
    val rows = graft.operators.TimeSeries.histogram2d(sf).collect()
    assert(rows.map(_.getLong(2)).sum == sf.lineitem.count())
    rows.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) <= 4)
      assert(r.getInt(1) >= 0 && r.getInt(1) <= 5)
    }
    // cell keys unique
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).distinct.length == rows.length)
  }

  test("ratio-to-parent shares sum to 1 within each region and overall") {
    val rows = graft.operators.Relational7.ratioToParent(sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, region) =>
      val s = region.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-9, s"region shares sum $s")
      // all nations in a region report the same region share
      assert(region.map(_.getDouble(4)).distinct.length == 1)
    }
    val regionShares = rows.groupBy(_.getString(0)).map(_._2.head.getDouble(4)).sum
    assert(math.abs(regionShares - 1.0) < 1e-9)
  }

  test("abc cumulative sum is distributed: range exchange, no global window partition") {
    val plan = Relational7.abcAnalysis(sf).queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning")
      || plan.contains("REPARTITION_BY_NUM"), plan)
    // the per-row cum window is keyed by the range bucket, not a
    // constant (the bucketed frame is localCheckpoint-pinned, so the
    // spark_partition_id projection itself is materialized inside the
    // checkpoint — assert on the window key, which survives)
    assert(plan.contains("windowspecdefinition(bucket"), plan)
  }

  test("unpivot melts the wide metric frame: 3 rows per priority, values = direct agg") {
    val rows = Relational7.unpivotMetrics(sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val direct = sf.orders.collect()
      .map(r => (r.getAs[String]("o_orderpriority"),
        BigDecimal(r.getAs[Double]("o_totalprice")).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1)
    assert(rows.size == direct.size * 3, s"${rows.size} rows for ${direct.size} priorities")
    direct.foreach { case (p, vs) =>
      val n = vs.size.toDouble
      val rev = vs.map(_._2).sum.toDouble
      assert(rows((p, "n_orders")) == n, s"$p n")
      assert(math.abs(rows((p, "revenue")) - rev) < 1e-6, s"$p revenue")
      assert(math.abs(rows((p, "avg_revenue")) - rev / n) < 1e-6, s"$p avg")
    }
    // the melt is an in-row Expand — no shuffle beyond the aggregation
    val plan = Relational7.unpivotMetrics(sf).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
  }
}
