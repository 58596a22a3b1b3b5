package graft

import graft.operators.{Etl, Relational}

class RelationalSpec extends SparkSpec {

  private def explainStr(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("pricing summary has one row per (returnflag, linestatus) and exact sums") {
    val rows = Relational.pricingSummary(sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0)                    // sum_qty
      assert(r.getLong(9) > 0)                      // count_order
      val avgQty = r.getDouble(6)
      assert(math.abs(avgQty - r.getDouble(2) / r.getLong(9)) < 1e-9)
    }
  }

  test("filter + projection are pushed down to the parquet scan") {
    val plan = explainStr(Relational.filterProject(sf))
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThan(p_retailprice"), plan)
    // pruned read schema: only the needed columns reach the scan
    assert(!plan.contains("p_type,p_size,p_retailprice,p_name,p_brand,p_partkey,p_container"))
  }

  test("fact enrichment joins are broadcast (no fact-side shuffle)") {
    val plan = explainStr(Etl.factSales(sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("topk per group emits at most 3 per nation, ranked") {
    val rows = Relational.topkPerGroup(sf).collect()
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
  }

  test("sessionize: session bounds are consistent and gaps exceed 30min across sessions") {
    val rows = Relational.sessionize(sf).collect()
    rows.foreach { r =>
      assert(!r.getTimestamp(3).after(r.getTimestamp(4))) // start <= end
      assert(r.getLong(2) >= 1)
    }
  }

  test("asof join only emits purchases, with a nullable prior view value") {
    val df = Relational.asofJoin(sf)
    assert(df.columns.sameElements(Seq("event_id", "user_id", "ts", "value", "asof_view_value")))
    assert(df.count() > 0)
  }

  test("asof nearest picks the closer side, ties backward, tolerance drops far views") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-asofn").toString
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2025-01-01 10:$m%02d:00")
    // user 1: view@10:00(v=1), purchase@10:10, view@10:15(v=2) -> forward closer (5m < 10m)
    // user 2: view@10:00(v=3), purchase@10:05, view@10:10(v=4) -> exact tie -> backward
    // user 3: view@10:00(v=5), purchase@11:30 -> backward beyond 1h -> no match
    // user 4: purchase@10:00, view@10:20(v=6) -> forward only
    Seq(
      (1L, t(0), "view", 1.0, "{}"), (2L, t(10), "purchase", 9.0, "{}"),
      (3L, t(15), "view", 2.0, "{}"),
      (4L, t(0), "view", 3.0, "{}"), (5L, t(5), "purchase", 9.0, "{}"),
      (6L, t(10), "view", 4.0, "{}"),
      (7L, t(0), "view", 5.0, "{}"),
      (8L, java.sql.Timestamp.valueOf("2025-01-01 11:30:00"), "purchase", 9.0, "{}"),
      (9L, t(0), "purchase", 9.0, "{}"), (10L, t(20), "view", 6.0, "{}"))
      .zipWithIndex.map { case ((eid, ts, et, v, p), i) =>
        (eid, ts, (i / 3 + 1).toLong, et, v, p)
      }
      .toDF("event_id", "ts", "ignore_uid", "event_type", "value", "props")
      .withColumn("user_id",
        org.apache.spark.sql.functions.expr(
          "CASE WHEN event_id <= 3 THEN 1 WHEN event_id <= 6 THEN 2 " +
            "WHEN event_id <= 8 THEN 3 ELSE 4 END"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.asofNearest(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> (Option(r.get(4)).map(_.toString.toDouble),
        Option(r.getString(5)))).toMap
    assert(got(2L) == ((Some(2.0), Some("forward"))), s"got ${got(2L)}")
    assert(got(5L) == ((Some(3.0), Some("backward"))), s"got ${got(5L)}")
    assert(got(8L) == ((None, None)), s"got ${got(8L)}")
    assert(got(9L) == ((Some(6.0), Some("forward"))), s"got ${got(9L)}")
  }

  test("rollup contains the grand total row") {
    val rows = Relational.rollupTotals(sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getLong(3) == sf.lineitem.count())
  }

  test("q17 prunes lineitem to qualifying part keys before the per-part aggregate") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // walk the pre-AQE physical tree: the aggregate NODE that produces
    // avg_qty must have a LeftSemi broadcast join in its OWN subtree —
    // a probe-side-only semi join would not satisfy this
    val plan = graft.operators.Relational4.smallQtyRevenue(sf)
      .queryExecution.sparkPlan
    val avgAggs = plan.collect {
      case a: BaseAggregateExec if a.resultExpressions.exists(_.name == "avg_qty") => a
    }
    assert(avgAggs.nonEmpty, s"no aggregate producing avg_qty in plan:\n$plan")
    avgAggs.foreach { a =>
      val semi = a.collectFirst {
        case j: BroadcastHashJoinExec if j.joinType == LeftSemi => j
      }
      assert(semi.nonEmpty,
        s"per-part aggregate is not fed by a LeftSemi-pruned scan:\n$a")
    }
  }
}
