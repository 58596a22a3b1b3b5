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
