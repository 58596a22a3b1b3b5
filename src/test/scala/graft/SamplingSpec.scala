package graft

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample is deterministic and respects per-stratum fractions") {
    val s1 = Sampling.stratified(sf).collect()
    val s2 = Sampling.stratified(sf).collect()
    assert(s1.map(_.toString).sameElements(s2.map(_.toString))) // rerun == rerun
    val total = sf.documents.count().toDouble
    val kept = s1.length / total
    assert(kept > 0.1 && kept < 0.9, s"kept fraction $kept out of plausible range")
    // each stratum individually lands near its configured fraction
    val bySrc = s1.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val counts = sf.documents.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    for ((src, frac) <- Seq("src0" -> 0.75, "src1" -> 0.5, "src2" -> 0.25)
         if counts.getOrElse(src, 0L) >= 50) {
      val got = bySrc.getOrElse(src, 0).toDouble / counts(src)
      assert(math.abs(got - frac) < 0.2, s"$src kept $got, wanted ~$frac")
    }
  }

  test("stratified sampling decision is a narrow filter (no hash exchange)") {
    // the only exchange allowed is the presentation orderBy's range
    // partitioning — the sampling decision itself must not shuffle
    val plan = Sampling.stratified(sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("per-key cap keeps at most k rows per key, deterministically") {
    val k = 5
    val rows = Sampling.perKeyCap(sf, k).collect()
    val perKey = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perKey.values.forall(_ <= k))
    // keys with >= k events are capped exactly at k
    val eventCounts = sf.events.groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    eventCounts.filter(_._2 >= k).keys.take(20).foreach { key =>
      assert(perKey(key) == k, s"user $key should be capped at $k")
    }
    val again = Sampling.perKeyCap(sf, k).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("balanced classes cuts every label to the smallest class size, deterministically") {
    val rows = graft.operators.Sampling.balancedClasses(sf).collect()
    val perLabel = rows.groupBy(_.getInt(0)).view.mapValues(_.length).toMap
    val trueCounts = sf.embeddings.groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val minN = trueCounts.values.min.toInt
    assert(perLabel.keySet == trueCounts.keySet)
    assert(perLabel.values.forall(_ == minN))
    // ranks are 1..minN per label
    rows.groupBy(_.getInt(0)).foreach { case (_, g) =>
      assert(g.map(_.getInt(1)).sorted.sameElements(1 to minN))
    }
    val again = graft.operators.Sampling.balancedClasses(sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("reservoir keeps exactly the k documents with the smallest key hash") {
    val rows = Sampling.reservoir(sf).collect()
    assert(rows.length == 100)
    // replay the bottom-k by hash on the driver
    import org.apache.spark.sql.functions.col
    val hashed = sf.documents.select(col("doc_id"))
      .withColumn("h", org.apache.spark.sql.functions.conv(
        org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.md5(col("doc_id").cast("string")), 1, 15),
        16, 10).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = hashed.sortBy { case (id, h) => (h, id) }.take(100).map(_._1).sorted
    assert(rows.map(_.getLong(0)).sameElements(expect))
    val again = Sampling.reservoir(sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("priority sample keeps the k smallest hash-div-weight priorities") {
    import org.apache.spark.sql.functions.col
    val rows = Sampling.prioritySample(sf).collect()
    assert(rows.length == 100)
    val docs = sf.documents.select(col("doc_id"),
        org.apache.spark.sql.functions.conv(
          org.apache.spark.sql.functions.substring(
            org.apache.spark.sql.functions.md5(col("doc_id").cast("string")), 1, 15),
          16, 10).cast("long").as("h"),
        col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pri = docs.map { case (id, h, nc) =>
      (id, h / math.min(math.max(nc, 1L), 2000L))
    }
    val expect = pri.sortBy { case (id, p) => (p, id) }.take(100)
      .map { case (id, p) => id -> p }.toMap
    assert(rows.map(r => r.getLong(0) -> r.getLong(3)).toMap == expect)
    // weighting bites: winners are longer than the corpus average
    val avgAll = docs.map(_._3).sum.toDouble / docs.length
    val winners = docs.filter(d => expect.contains(d._1))
    val avgWin = winners.map(_._3).sum.toDouble / winners.length
    assert(avgWin > avgAll, s"weighted winners avg $avgWin vs corpus $avgAll")
  }

  test("curriculum phases are exact token-count quartiles walked in order") {
    val rows = Sampling.curriculum(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    assert(n == sf.documents.count())
    // position is a permutation of 1..n
    assert(rows.map(_._4).sorted.toSeq == (1L to n).toSeq)
    // phases 1..4 partition the corpus into ceil-quantile groups
    val byPhase = rows.groupBy(_._3)
    assert(byPhase.keySet == Set(1L, 2L, 3L, 4L))
    val sizes = (1L to 4L).map(p => byPhase(p).length)
    assert(sizes.sum == n && (sizes.max - sizes.min) <= 1)
    // phase cut respects the (n_tokens, doc_id) order
    for (p <- 1L to 3L) {
      val hi = byPhase(p).map(r => (r._2, r._1)).max
      val lo = byPhase(p + 1).map(r => (r._2, r._1)).min
      assert(Ordering[(Long, Long)].lt(hi, lo), s"phase $p cut: $hi !< $lo")
    }
    // positions walk phases in order
    for (p <- 1L to 3L) {
      assert(byPhase(p).map(_._4).max < byPhase(p + 1).map(_._4).min)
    }
    // in-phase order is the doc_id hash, not a length ramp: token counts
    // inside a phase must not be globally sorted by position
    val inPhase = byPhase(1L).sortBy(_._4).map(_._2).toSeq
    assert(inPhase != inPhase.sorted || inPhase.distinct.size <= 1)
  }
  test("negative samples never collide with purchases and follow draw order") {
    val rows = Sampling.negativeSample(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val byOrder = sf.orders.select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val purchased = sf.lineitem.select("l_orderkey", "l_partkey").collect()
      .flatMap(r => byOrder.get(r.getLong(0)).map(c => (c, r.getLong(1))))
      .toSet
    val partKeys = sf.part.select("p_partkey").collect().map(_.getLong(0)).toSet
    rows.foreach { case (u, p, d) =>
      assert(!purchased.contains((u, p)), s"user $u neg $p was purchased")
      assert(partKeys.contains(p))
      assert(d >= 1 && d <= 15)
    }
    // at most 5 per user, deduped
    rows.groupBy(_._1).foreach { case (u, ns) =>
      assert(ns.length <= 5, s"user $u got ${ns.length}")
      assert(ns.map(_._2).distinct.length == ns.length)
    }
    // replay one user's full draw sequence
    val u0 = rows.map(_._1).min
    val nParts = sf.part.agg(org.apache.spark.sql.functions.max("p_partkey"))
      .collect().head.getLong(0) + 1
    def unitHash(key: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16).toDouble /
        1152921504606846976.0
    }
    val expected = (1 to 15)
      .map(i => (math.floor(unitHash(s"${u0}_$i") * nParts).toLong, i))
      .filter { case (p, _) => partKeys.contains(p) && !purchased.contains((u0, p)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toSeq
      .sortBy { case (p, d) => (d, p) }.take(5)
      .map { case (p, d) => (u0, p, d) }
    assert(rows.filter(_._1 == u0).sortBy(x => (x._3, x._2)).toSeq == expected)
  }
}
