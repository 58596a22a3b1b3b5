package graft

import graft.operators.{Curation, Relational5}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate flags only non-benchmark docs and is deterministic") {
    val rows = Curation.decontaminate(sf).collect()
    // no benchmark doc may appear in the output
    assert(rows.forall(_.getLong(0) % 97 != 0))
    assert(rows.forall(_.getLong(1) >= 1)) // every flagged doc matched something
    val again = Curation.decontaminate(sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("decontaminate joins hashed grams with a broadcast benchmark side") {
    val plan = Curation.decontaminate(sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("repetition filter ratios are in range and keep flag matches thresholds") {
    val rows = Curation.repetitionFilter(sf).collect()
    assert(rows.length == sf.documents.count())
    rows.foreach { r =>
      val topf = r.getDouble(1); val dup = r.getDouble(2); val keep = r.getBoolean(3)
      assert(topf > 0.0 && topf <= 1.0)
      assert(dup >= 0.0 && dup < 1.0)
      assert(keep == (topf <= 0.25 && dup <= 0.10))
    }
    // the gate actually separates: some docs kept, some filtered
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)))
  }

  test("weighted sample keeps long docs more often than short ones") {
    val rows = Curation.weightedSample(sf).collect()
    assert(rows.nonEmpty && rows.length < sf.documents.count())
    val again = Curation.weightedSample(sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
    // no sf dir has docs at the 600-char cap, so exercise the p_keep=1.0
    // branch with a synthetic corpus: capped docs must ALL survive
    val dir = java.nio.file.Files.createTempDirectory("graft-wsample").toString
    (0L until 50L).map(i => (i, "w " * 30, "en", "s", if (i < 25) 700L else 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val synth = Curation.weightedSample(Tables(spark, dir)).collect()
    assert(synth.count(_.getDouble(3) == 1.0) == 25) // every capped doc kept
    assert(synth.count(_.getDouble(3) < 1.0) < 25)   // short docs thinned
  }

  test("weighted sampling decision is a narrow filter (no hash exchange)") {
    val plan = Curation.weightedSample(sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("temperature sample flattens skew: small sources keep a larger fraction") {
    // skewed synthetic corpus: src_big 160 docs, src_small 10
    val dir = java.nio.file.Files.createTempDirectory("graft-tsample").toString
    ((0L until 160L).map(i => (i, "a b c", "en", "src_big", 5L)) ++
      (160L until 170L).map(i => (i, "a b c", "en", "src_small", 5L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Curation.temperatureSample(Tables(spark, dir)).collect()
    val thrBig = rows.find(_.getString(1) == "src_big").map(_.getDouble(2))
    val thrSmall = rows.find(_.getString(1) == "src_small").map(_.getDouble(2))
    // thresholds replay the T=2 rule: B=85, w=(12,3), W=15 — the small
    // source's uncapped share exceeds its size, so it caps at keep-all
    assert(thrBig.contains(math.floor(85.0 * 12 * 1000000 / (15.0 * 160))))
    assert(thrSmall.contains(math.min(1000000.0,
      math.floor(85.0 * 3 * 1000000 / (15.0 * 10)))))
    // √-flattening: the small source keeps a LARGER fraction of itself
    assert(thrSmall.get > thrBig.get)
  }

  test("temperature sample is deterministic and within the overall budget shape") {
    val rows = Curation.temperatureSample(sf).collect()
    val total = sf.documents.count()
    assert(rows.nonEmpty && rows.length < total)
    // expected yield ~ budget (half the corpus); hash thinning is
    // binomial around it — accept a wide band, exactness is the oracle's job
    assert(rows.length > total / 4 && rows.length < total * 3 / 4)
    val again = Curation.temperatureSample(sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("temperature sample keep decision is broadcast-joined, no doc-side exchange") {
    val plan = Curation.temperatureSample(sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("pretrain pipeline: stage flags match the standalone operators, packing replays") {
    val rows = Curation.pretrainPipeline(sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7))))
    assert(rows.length == sf.documents.count())
    // kept is the conjunction; bin present exactly for kept docs
    rows.foreach { case (id, q, d, c, p, kept, _, bin) =>
      assert(kept == (q && d && c && p), s"doc $id")
      assert(bin.isDefined == kept, s"doc $id bin presence")
    }
    // flags agree with the standalone stages
    val gq = graft.operators.TextAnalysis2.gopherColumns(sf.documents)
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val dc = Curation.decontaminate(sf).collect().map(_.getLong(0)).toSet
    val pg = Curation.perplexityGate(sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    rows.foreach { case (id, q, _, c, p, _, _, _) =>
      assert(q == gq(id), s"doc $id quality flag")
      assert(c == (id % 97 != 0 && !dc.contains(id)), s"doc $id clean flag")
      assert(p == pg.getOrElse(id, true), s"doc $id ppl flag")
    }
    // packing replay: greedy bins from the output's own kept token counts
    var cum = 0L
    rows.filter(_._6).sortBy(_._1).foreach { case (id, _, _, _, _, _, n, bin) =>
      assert(bin.contains(cum / 2048), s"doc $id bin")
      cum += n
    }
    // the gate actually drops something and keeps something
    assert(rows.exists(_._6) && rows.exists(!_._6))
  }

  test("dedup pipeline: tier flags match the standalone operators") {
    val rows = Curation.dedupPipeline(sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(rows.length == sf.documents.count())
    rows.foreach { case (id, e, n, s, kept) =>
      assert(kept == (e && n && s), s"doc $id conjunction")
    }
    // exact tier: min id per identical text wins
    val texts = sf.documents.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val minByText = texts.groupBy(_._2).map { case (_, ds) => ds.map(_._1).min }.toSet
    rows.foreach { case (id, e, _, _, _) =>
      assert(e == minByText.contains(id), s"doc $id exact flag")
    }
    // near-dup tier equals keepBest, semantic tier equals semDedup
    val kb = graft.operators.Dedup.keepBest(sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val sd = graft.operators.Similarity.semDedup(sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    rows.foreach { case (id, _, n, s, _) =>
      assert(n == kb(id), s"doc $id neardup flag")
      assert(s == sd(id), s"doc $id semantic flag")
    }
    assert(rows.exists(_._5) && rows.exists(!_._5))
  }

  test("q15 top supplier: every returned supplier has the max revenue") {
    val rows = Relational5.topSupplier(sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, s"ties must share one revenue, got ${revs.toSeq}")
  }

  test("q22 idle customers only counts customers without orders") {
    val out = Relational5.idleCustomers(sf)
    val total = out.agg(org.apache.spark.sql.functions.sum("numcust"))
      .as[Option[Long]].head().getOrElse(0L)
    val withOrders = sf.customer
      .join(sf.orders, $"c_custkey" === $"o_custkey", "left_semi").count()
    assert(total <= sf.customer.count() - withOrders)
  }

  test("gaps-islands streaks are consistent: longest <= active days") {
    val rows = Relational5.activityStreaks(sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(3)) // longest_streak <= active_days
      assert(r.getLong(2) >= 1)            // at least one streak
    }
  }

  test("incremental dedup equals the batch-involved slice of full dedup") {
    import org.apache.spark.sql.functions.col
    val inc = graft.operators.Dedup.incrementalDedup(sf)
    // every returned pair involves a batch doc
    assert(inc.collect().forall(r => r.getLong(0) % 5 == 0 || r.getLong(1) % 5 == 0))
    // and it equals the full-dedup output restricted to batch pairs
    val full = graft.operators.Dedup.minhashLsh(sf)
      .where(col("a_id") % 5 === 0 || col("b_id") % 5 === 0)
    assert(inc.except(full).isEmpty && full.except(inc).isEmpty)
  }

  test("keep-best dedup keeps exactly one best-quality doc per cluster") {
    val rows = graft.operators.Dedup.keepBest(sf).collect()
    assert(rows.length == sf.documents.count())
    rows.groupBy(_.getLong(1)).foreach { case (cid, rs) =>
      val keepers = rs.filter(_.getBoolean(3))
      assert(keepers.length == 1, s"cluster $cid has ${keepers.length} keepers")
      // the keeper dominates by (n_chars desc, doc_id asc)
      val best = rs.minBy(r => (-r.getLong(2), r.getLong(0)))
      assert(keepers.head.getLong(0) == best.getLong(0))
    }
  }

  test("rfm scores are quartiles 1..4 and deterministic") {
    val rows = graft.operators.Analytics.rfm(sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(4, 5, 6).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 4))
      assert(r.getLong(2) >= 1) // frequency
    }
    val again = graft.operators.Analytics.rfm(sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("distributed global rank + ntile formula equals the window ntile") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = sf.customer.select($"c_custkey", $"c_acctbal")
    val (ranked, n) = graft.operators.Ranks
      .withGlobalRank(df, "_rk", col("c_acctbal").desc, col("c_custkey"))
    val viaRanks = ranked.select($"c_custkey",
      graft.operators.Ranks.ntileOf(4, col("_rk"), n).as("nt"))
    val viaWindow = df.select($"c_custkey",
      ntile(4).over(Window.orderBy(col("c_acctbal").desc, col("c_custkey"))).as("nt"))
    assert(viaRanks.except(viaWindow).isEmpty && viaWindow.except(viaRanks).isEmpty)
  }

  test("ntile formula matches window ntile at edge-case sizes (n<k, ties of size)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (n <- Seq(1L, 2L, 3L, 4L, 5L, 7L, 9L, 64L)) {
      val df = spark.range(n).toDF("id")
      val (ranked, total) = graft.operators.Ranks
        .withGlobalRank(df, "_rk", col("id"))
      val viaRanks = ranked.select($"id",
        graft.operators.Ranks.ntileOf(4, col("_rk"), total).as("nt"))
      val viaWindow = df.select($"id",
        ntile(4).over(Window.orderBy("id")).as("nt"))
      assert(viaRanks.except(viaWindow).isEmpty &&
        viaWindow.except(viaRanks).isEmpty, s"n=$n diverged")
    }
  }

  test("fused multi-metric global rank equals per-metric window ranks") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = sf.customer.select($"c_custkey", $"c_acctbal", $"c_nationkey")
    val (ranked, n) = graft.operators.Ranks.withGlobalRanksFused(df, "c_custkey", Seq(
      "r_bal" -> -col("c_acctbal").cast("double"),
      "r_nat" -> col("c_nationkey").cast("double")))
    val viaWindow = df.select($"c_custkey",
      row_number().over(Window.orderBy(col("c_acctbal").desc, col("c_custkey")))
        .cast("long").as("r_bal"),
      row_number().over(Window.orderBy(col("c_nationkey"), col("c_custkey")))
        .cast("long").as("r_nat"))
    assert(ranked.except(viaWindow).isEmpty && viaWindow.except(ranked).isEmpty)
    assert(n == df.count())
  }

  test("rfm plan has no unpartitioned window (single-partition scale hazard)") {
    val plan = graft.operators.Analytics.rfm(sf).queryExecution.executedPlan.toString
    // every Window partitions by _pid; an empty partition spec would read
    // "windowspecdefinition(" immediately followed by the order spec only
    assert(!plan.contains("Window [ntile"), plan)
  }

  test("markov transition probabilities sum to 1 per source state") {
    val rows = graft.operators.Analytics.markovTransitions(sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-9, s"$src probabilities sum to $total")
    }
  }

  test("quarantine routes bad rows with accumulated reasons, good rows clean") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quar").toString
    val nanos = 1704067200L * 1000000000L // epoch nanos, as the raw source stores ts
    Seq(
      (1L, nanos, Option(7L), "view", 10.0, "{}"),
      (2L, nanos, Option(7L), "error", 10.0, "{}"),
      (3L, nanos, None, "error", -1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.operators.Etl.quarantine(Tables(spark, dir)).collect()
    assert(!rows(0).getBoolean(3) && rows(0).getString(4).isEmpty)
    assert(rows(1).getBoolean(3) && rows(1).getString(4) == "unknown_type")
    assert(rows(2).getBoolean(3) &&
      rows(2).getString(4) == "unknown_type,value_range,null_user")
  }

  test("quarantine is a narrow row-local projection (no shuffle before sort)") {
    val plan = graft.operators.Etl.quarantine(sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("time-weighted average stays within each user's value range") {
    import org.apache.spark.sql.functions._
    val twa = graft.operators.TimeSeries.timeWeightedAvg(sf)
    val bounds = sf.events.groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val bad = twa.join(bounds, "user_id")
      .where($"twa" < $"lo" - lit(1e-9) || $"twa" > $"hi" + lit(1e-9))
    assert(bad.isEmpty, bad.limit(5).collect().mkString(";"))
    // total_dur and n_intervals positive
    assert(twa.collect().forall(r => r.getLong(2) > 0 && r.getLong(3) >= 1))
  }

  test("semi-additive month-end balance equals total net through that month") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.TimeSeries.semiAdditive(sf)
    val lastRow = out.orderBy($"l_partkey", $"month".desc)
      .groupBy("l_partkey").agg(first("month_end_balance").as("final_bal"))
    // the final month-end balance per part == the part's total net movement
    val truth = sf.lineitem
      .where($"l_shipdate".between(
        lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
      .groupBy("l_partkey")
      .agg(sum($"l_quantity".cast("decimal(12,2)")).cast("double").as("total_net"))
    val joined = lastRow.join(truth, "l_partkey")
      .where(abs($"final_bal" - $"total_net") > 1e-9)
    assert(joined.isEmpty, joined.limit(5).collect().mkString(";"))
  }

  test("q9/q15 star joins broadcast dims; q12 fact-fact join never cartesian") {
    for (df <- Seq(Relational5.profitByNation(sf), Relational5.topSupplier(sf))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    }
    val q12 = Relational5.latePriorityLines(sf).queryExecution.executedPlan.toString
    assert(!q12.contains("CartesianProduct") && !q12.contains("NestedLoop"), q12)
  }

  test("curate pipeline composes the gate and keep-best verdicts auditable per stage") {
    val rows = Curation.curateCorpus(sf).collect()
    assert(rows.length == sf.documents.count())
    rows.foreach { r =>
      assert(r.getBoolean(6) ==
        (r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5)))
    }
    // stages must actually reject something, and the composition keeps
    assert(rows.exists(!_.getBoolean(3)) && rows.exists(!_.getBoolean(4)))
    assert(rows.exists(_.getBoolean(6)))
    // stage verdicts match the standalone operators
    val gate = graft.operators.TextAnalysis2.gopherQuality(sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(11)).toMap
    val kb = graft.operators.Dedup.keepBest(sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val dom = Curation.domainFilter(sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    rows.foreach { r =>
      assert(r.getBoolean(3) == gate(r.getLong(0)))
      assert(r.getBoolean(4) == kb(r.getLong(0)))
      assert(r.getBoolean(5) == dom(r.getLong(0)))
    }
  }

  test("skew report surfaces the heaviest keys with consistent shares") {
    val rows = graft.operators.Profiler.skewReport(sf).collect()
    assert(rows.length == 10)
    val ns = rows.map(_.getLong(1))
    assert(ns.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    val total = sf.lineitem.count().toDouble
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getLong(1) / total) < 1e-12)
      assert(r.getDouble(3) > 0)
    }
  }

  test("benford audit digit counts and deviations match the replay") {
    val digits = sf.orders.select("o_totalprice").collect()
      .map(r => math.floor(r.getDouble(0)).toLong.toString.charAt(0) - '0')
    val counts = digits.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = digits.length.toLong
    val rows = graft.operators.Profiler.benfordAudit(sf).collect()
    assert(rows.map(_.getInt(0)).toSet == counts.keySet)
    rows.foreach { r =>
      val d = r.getInt(0)
      val share = counts(d).toDouble / total.toDouble
      val expected = math.log10(1 + 1.0 / d)
      assert(r.getLong(1) == counts(d))
      assert(r.getDouble(2) == share)
      assert(r.getDouble(3) == expected)
      assert(r.getDouble(4) == share - expected)
    }
    // counts cover every order exactly once
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("domain filter: parsed domain, blocklist, and per-domain cap") {
    val rows = graft.operators.Curation.domainFilter(sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(rows.length == sf.documents.count())
    rows.foreach { case (id, url, domain, blocked, keep) =>
      // domain = host minus scheme/www/port/path, lowercase source + tld
      assert(!domain.contains("/") && !domain.contains(":") && !domain.startsWith("www."),
        s"$url -> $domain")
      assert(url.contains(domain))
      val tld = Seq(".com", ".org", ".net")((((id % 3) + 3) % 3).toInt)
      assert(domain.endsWith(tld), s"$url -> $domain")
      assert(blocked == (domain.endsWith(".net") || domain == "src0.com"))
      if (blocked) assert(!keep)
    }
    // the cap binds per domain: never more than DomainCap keeps
    rows.filter(_._5).groupBy(_._3).foreach { case (d, g) =>
      assert(g.length <= 5, s"domain $d kept ${g.length}")
    }
    // both gate outcomes occur
    assert(rows.exists(_._4) && rows.exists(r => !r._4 && r._5))
  }

  test("perplexity gate: holdout excluded, cut bounded at the percentile") {
    val t = sf
    val rows = graft.operators.Curation.perplexityGate(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // the LM-training slice is never scored; bigram-less docs absent
    assert(rows.forall(_._1 % 7 != 0))
    rows.foreach { case (_, nb, score, _) =>
      assert(nb >= 1 && score >= 0 && score <= 1000000L)
    }
    // at most floor(25% of scored docs) are dropped, and the dropped set
    // is exactly the scores at or below the threshold implied by keeps
    val dropped = rows.filter(!_._4)
    assert(dropped.length <= rows.length * 25 / 100)
    if (dropped.nonEmpty) {
      val thr = dropped.map(_._3).max
      assert(rows.filter(_._4).forall(_._3 > thr))
    }
    val again = graft.operators.Curation.perplexityGate(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.sameElements(again))
  }
  test("corpus report replays per-source counts from the raw docs") {
    val rows = graft.operators.Profiler.corpusReport(sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    val docs = sf.documents.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.keySet == docs.map(_._2).toSet)
    val dupTexts = docs.groupBy(_._3).filter(_._2.length > 1).keySet
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val (n, nDup, _, toks, dr, _, mt) = rows(src)
      assert(n == ds.length)
      assert(nDup == ds.count(d => dupTexts.contains(d._3)), s"src $src dups")
      val totalToks = ds.map(_._3.split(" ", -1).length.toLong).sum
      assert(toks == totalToks)
      assert(math.abs(dr - nDup.toDouble / n) < 1e-12)
      assert(math.abs(mt - totalToks.toDouble / n) < 1e-12)
    }
  }
}
