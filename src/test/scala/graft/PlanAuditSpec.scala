package graft

/** Whole-inventory plan audit: no registered query may plan a cartesian
  * product, and every parquet scan must prune columns (no scan reads a
  * table's full width unless the operator genuinely consumes it).
  * This is the automated sweep behind the per-operator plan assertions —
  * a regression that sneaks a cross join or kills pruning fails HERE.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // operators documented to consume (nearly) every column of a table
  private val fullWidthOk = Set(
    "q_profile", "q_dq_checks", "etl_normalize", "etl_quarantine",
    "q_sql_interface", "src_parquet")

  test("no registered query plans a cartesian product") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      // BroadcastNestedLoopJoin appears for broadcast-1-row crossJoins,
      // which are bounded by construction; CartesianProduct is the
      // unbounded shuffle-side catastrophe
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: $offenders")
  }

  test("no registered query's RESULT plan reads a cached relation") {
    // the r10/r11 lesson, regression-proofed: a cacheManager cache in
    // the result path builds the query as a CACHED plan with AQE
    // re-planning restricted (+25-35% task CPU measured) and leaks the
    // entry past the query. Training-time caches are fine ONLY if
    // released before the result frame is handed back; cross-consumer
    // reuse must ride localCheckpoint or a SessionMemo frame instead.
    spark.catalog.clearCache()
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val df = fn(spark, dir)
      val cached = df.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan")
      // every operator must also leave the cache EMPTY once its frame
      // is built (leaked entries pile up across a 300-query session)
      val leaked = !spark.sharedState.cacheManager.isEmpty
      spark.catalog.clearCache()
      (if (cached) Seq(s"$name plans InMemoryTableScan") else Nil) ++
        (if (leaked) Seq(s"$name leaks a cache entry") else Nil)
    }
    assert(offenders.isEmpty, s"cached-plan offenders:\n${offenders.mkString("\n")}")
  }

  // an UNPARTITIONED window funnels its whole input through ONE task —
  // fine over a provably bounded frame, a scale-killer over a fact- or
  // part-dimension-sized one (the r12 q_ks_test/q_mann_whitney/
  // q_skyline/q_equidepth_hist finding, since rewritten onto
  // Ranks.withGlobalRank / withGlobalPrefixAggs). Any REMAINING
  // unpartitioned window must be whitelisted here WITH its boundedness
  // argument; a new operator that re-introduces the pattern fails this
  // test by default. The stale-entry check keeps the list honest.
  private val unpartitionedWindowOk: Map[String, String] = Map(
    // two-level prefix scans: the unpartitioned window runs over the
    // per-partition OFFSET rows (≤ shuffle partitions), never the data
    "q_abc_analysis" -> "bucket-offset rows (≤32, two-level prefix)",
    "q_abc_xyz" -> "bucket-offset rows (≤32, two-level prefix)",
    "q_concurrency_peak" -> "bucket-offset rows (≤32, two-level prefix)",
    "q_theil_sen" -> "bucket offsets + per-calendar-day residual median",
    "text_pack_sequences" -> "bucket-offset rows (≤32, two-level prefix)",
    // calendar-bounded series: one row per day/month of a fixed span
    "q_moving_average" -> "calendar-day series",
    "q_control_chart" -> "calendar-day series",
    "q_cumulative_reach" -> "calendar-day series",
    "q_rolling_corr" -> "calendar-day series",
    "q_bollinger" -> "calendar-day series",
    "q_stl_decompose" -> "calendar-day/period series",
    "q_ordinal_patterns" -> "calendar-day series",
    "q_runs_test" -> "calendar-day sign series",
    "q_forecast_backtest" -> "calendar-month series",
    "q_kaplan_meier" -> "distinct duration days (calendar-span bounded)",
    "q_nelson_aalen" -> "distinct duration days (calendar-span bounded)",
    "q_gap_histogram" -> "distinct gap lengths (calendar-span bounded)",
    "graph_eff_diameter" -> "hop-count rows (≤ BFS rounds)",
    // small-dimension / post-aggregation frames
    "q_seasonality" -> "day-of-week / month dimension rows",
    "q_seasonal_strength" -> "period dimension rows",
    "q_residual_acf" -> "lag dimension (fixed max lag)",
    "q_benford" -> "9 leading-digit rows",
    "q_ratio_to_parent" -> "region/nation hierarchy dims",
    "q_allocation" -> "nation dimension (25 rows)",
    "q_benjamini_hochberg" -> "25-brand test family rank window",
    "q_equidepth_hist" -> "10-bucket post-agg revenue-share frame",
    "q_quantile_sketch_audit" -> "fixed-width sketch bucket histogram",
    "graph_degree_dist" -> "distinct-degree histogram rows",
    // post-limit top-k frames
    "text_vocab" -> "post-limit top-k vocab frame",
    "ann_hybrid_rrf" -> "post-limit top-k fusion frames",
    "ann_recall_report" -> "post-limit top-k frames",
    // composition of whitelisted stages (pack_sequences offsets + vocab)
    "pipeline_pretrain" -> "composed bounded stages (bucket offsets, top-k vocab)")

  test("no unpartitioned window outside the bounded-frame whitelist") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val n = fn(spark, dir).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }.size
      if (n > 0) Some(name) else None
    }.toSet
    val unexpected = offenders -- unpartitionedWindowOk.keySet
    val stale = unpartitionedWindowOk.keySet -- offenders
    assert(unexpected.isEmpty,
      s"unpartitioned windows need a boundedness justification: $unexpected")
    assert(stale.isEmpty, s"stale whitelist entries (no longer plan one): $stale")
  }

  test("every events/lineitem/documents scan prunes columns") {
    val tableWidths = Map(
      "events" -> sf.events.schema.size,
      "lineitem" -> sf.lineitem.schema.size,
      "documents" -> sf.documents.schema.size)
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      if (fullWidthOk(name)) Nil
      else {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        // each scan line carries ReadSchema: struct<...>; count its fields
        plan.linesIterator.flatMap { line =>
          val i = line.indexOf("ReadSchema: struct<")
          if (i < 0) None
          else {
            val spec = line.substring(i + "ReadSchema: struct<".length)
              .takeWhile(_ != '>')
            val nCols = if (spec.trim.isEmpty) 0 else spec.count(_ == ':')
            tableWidths.collectFirst {
              case (tbl, width) if line.contains(s"$tbl.parquet") && nCols >= width && width > 2 =>
                s"$name reads all $nCols cols of $tbl"
            }
          }
        }.toSeq
      }
    }
    assert(offenders.isEmpty, s"unpruned scans:\n${offenders.mkString("\n")}")
  }
}
