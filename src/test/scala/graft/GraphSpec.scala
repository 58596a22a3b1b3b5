package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {

  private val Mass = 1000000000000000L

  /** In-memory replay of the exact integer PageRank the operator runs. */
  private def replay(): Map[Long, Long] = {
    val items = sf.lineitem.select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val baskets = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val pairSupport = baskets.values.toSeq
      .flatMap(ps => for (a <- ps; b <- ps if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size)
    val canonical = pairSupport.filter(_._2 >= 2).keys.toSet
    val edges = canonical ++ canonical.map { case (a, b) => (b, a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val share = Mass / deg.size
    val tele = 15L * share / 100L
    var rank = deg.keys.map(_ -> share).toMap
    for (_ <- 1 to 5) {
      val contrib = rank.map { case (u, r) => u -> r / deg(u) }
      val inbox = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (u, v) => inbox(v) += contrib(u) }
      rank = inbox.map { case (v, s) => v -> (tele + 85L * s / 100L) }.toMap
    }
    rank
  }

  test("pagerank matches the exact integer replay node-for-node") {
    val got = Graph.pageRank(sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == replay())
  }

  test("pagerank conserves mass up to truncation and orders by rank") {
    val rows = Graph.pageRank(sf).collect()
    val total = rows.map(_.getLong(1)).sum
    // each contrib/tele division truncates < 1 femto; with 5 supersteps
    // the loss is microscopic against the 10^15 mass
    assert(total <= Mass && total > (Mass * 95) / 100)
    val ranks = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(ranks.sameElements(ranks.sortBy { case (r, p) => (-r, p) }))
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getLong(1).toDouble / 1e15)
      assert(r.getLong(1) > 0)
    }
  }

  test("pagerank is deterministic across runs") {
    val a = Graph.pageRank(sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Graph.pageRank(sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("triangle counts and clustering coefficients match an in-memory replay") {
    val items = sf.lineitem.select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val baskets = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val canonical = baskets.values.toSeq
      .flatMap(ps => for (a <- ps; b <- ps if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2).keys.toSet
    val adj = (canonical ++ canonical.map { case (a, b) => (b, a) })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triPerNode = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((a, b) <- canonical; c <- adj(a) if c > b && adj(b).contains(c)) {
      triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1
    }
    val rows = Graph.triangles(sf).collect()
    assert(rows.map(_.getLong(0)).toSet == adj.keySet)
    rows.foreach { r =>
      val (n, d, t, cc) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d == adj(n).size.toLong)
      assert(t == triPerNode(n), s"node $n")
      val expCc = if (d >= 2) (2.0 * t) / (d * (d - 1)) else 0.0
      assert(cc == expCc)
    }
    assert(rows.map(_.getLong(2)).sum % 3 == 0) // each triangle counted thrice
    assert(rows.exists(_.getLong(2) > 0))
  }

  test("recommendations are the jaccard top-3 per part, cut by the heap plan") {
    val items = sf.lineitem.select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val np = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val support = items.groupBy(_._1).values.toSeq
      .flatMap(es => { val ps = es.map(_._2).toSet
        for (a <- ps; b <- ps if a < b) yield (a, b) })
      .groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2)
    val sym = support.toSeq.flatMap { case ((a, b), s) => Seq((a, b, s), (b, a, s)) }
    val expected = sym
      .map { case (p, r, sup) => (p, r, sup.toDouble / (np(p) + np(r) - sup)) }
      .groupBy(_._1).view
      .mapValues(_.sortBy { case (_, r, j) => (-j, r) }.take(3).map(x => (x._2, x._3)))
      .toMap
    val got = Graph.recommend(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (p, recs) => assert(recs == expected(p), s"part $p") }
    // the per-part cut runs on the custom heap plan, not a window sort
    val plan = Graph.recommend(sf).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Window"))
  }
}
