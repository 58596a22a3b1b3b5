package graft

import graft.operators.{Relational5, Similarity}

class Similarity2Spec extends SparkSpec {

  test("knn join returns exactly k ranked neighbours per vector") {
    val rows = Similarity.knnJoin(sf).collect()
    val n = sf.embeddings.count()
    assert(rows.length == n * 3)
    val byVec = rows.groupBy(_.getLong(0))
    byVec.foreach { case (_, nbs) =>
      assert(nbs.map(_.getInt(3)).sorted.sameElements(Array(1, 2, 3)))
      // ranks follow descending cosine
      val sorted = nbs.sortBy(_.getInt(3))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(2) >= b.getDouble(2)
        case _           => true
      })
      // no self-neighbours
      assert(nbs.forall(r => r.getLong(0) != r.getLong(1)))
    }
  }

  test("knn join agrees with a brute-force recount for one vector") {
    import spark.implicits._
    val vecs = sf.embeddings
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    val (qid, qv) = vecs.head
    val expect = vecs.filter(_._1 != qid)
      .map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(3).map(_._1)
    val got = Similarity.knnJoin(sf).where(s"vec_id = $qid")
      .orderBy("nn_rank").collect().map(_.getLong(1))
    assert(got.sameElements(expect))
  }

  test("lsh knn join: neighbours come only from the hamming-1 probe ring, scored exactly") {
    import org.apache.spark.sql.functions.col
    val rows = Similarity.knnJoinLsh(sf).collect()
    assert(rows.nonEmpty)
    // buckets recomputed through the same signBucket projection
    val buckets = sf.embeddings
      .select(col("vec_id"),
        Similarity.signBucket(col("embedding").cast("array<double>")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = sf.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a != b)
      assert(Integer.bitCount(buckets(a) ^ buckets(b)) <= 1,
        s"pair ($a,$b) outside the probe ring")
      // the directed score is the exact cosine, not an approximation
      val (va, vb) = (vecs(a), vecs(b))
      val cos = va.zip(vb).map { case (x, y) => x * y }.sum /
        (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
      assert(math.abs(r.getDouble(2) - cos) < 1e-12)
    }
    // per-vector ranks are contiguous from 1 and capped at k
    rows.groupBy(_.getLong(0)).foreach { case (_, nbs) =>
      assert(nbs.length <= 3)
      assert(nbs.map(_.getInt(3)).sorted.sameElements(1 to nbs.length))
    }
  }

  test("lsh knn join plan: equi-join on buckets plus heap reduction, no all-pairs replication") {
    val plan = Similarity.knnJoinLsh(sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
    assert(plan.contains("TopKPerKey"), plan)
    // the exact tier's triangle replication (explode over a block
    // sequence) must NOT appear in the bucketed path — candidates come
    // from one bucket equi-join
    assert(!plan.toLowerCase.contains("sequence("), plan)
  }

  test("cluster outliers emits at most 5 per cell, farthest first") {
    val rows = Similarity.clusterOutliers(sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(0)).foreach { case (_, cell) =>
      assert(cell.length <= 5)
      val sorted = cell.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).sameElements(1 to cell.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(2) >= b.getDouble(2)
        case _           => true
      })
    }
  }

  test("q21 waiting suppliers: every reported supplier was the sole late one") {
    // recount one reported supplier by hand over the raw tables
    val rows = Relational5.waitingSuppliers(sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 1))
    // descending numwait with s_name tie-break
    val pairs = rows.map(r => (r.getLong(2), r.getString(0)))
    assert(pairs.sliding(2).forall {
      case Array((n1, s1), (n2, s2)) => n1 > n2 || (n1 == n2 && s1 <= s2)
      case _                         => true
    })
  }

  test("q21 plan broadcasts the dimension joins and shuffles only on the order key") {
    val plan = Relational5.waitingSuppliers(sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }

  test("q16: bucket counts exclude in-arrears suppliers; one bucket recounted by hand") {
    import org.apache.spark.sql.functions.col
    val rows = Relational5.partSupplierCounts(sf).collect()
    assert(rows.nonEmpty)
    val bad = sf.supplier.where(col("s_acctbal") < 0)
      .collect().map(_.getLong(0)).toSet
    val parts = sf.part.collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getString(3), r.getInt(4)))).toMap
    val sizes = Set(1, 4, 7, 10, 13, 16, 19, 22)
    val pairs = sf.lineitem.select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = pairs
      .filter { case (p, s) => !bad.contains(s) && parts.get(p).exists {
        case (brand, tpe, size) =>
          brand != "Brand#3" && !tpe.startsWith("PROMO") && sizes.contains(size)
      } }
      .groupBy { case (p, _) => parts(p) }
      .view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    val got = rows.map(r =>
      ((r.getString(0), r.getString(1), r.getInt(2)), r.getLong(3))).toMap
    assert(got == expect)
  }

  test("q20: exactly the suppliers dominating a small-part's 1996 volume, nation-gated") {
    import org.apache.spark.sql.functions.{col, year}
    val rows = Relational5.dominantSuppliers(sf).collect()
    val smallParts = sf.part.where(col("p_name").startsWith("small"))
      .collect().map(_.getLong(0)).toSet
    val qty = sf.lineitem.where(year(col("l_shipdate")) === 1996)
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
      .filter(r => smallParts.contains(r.getLong(0)))
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .view.mapValues(_.map(r => BigDecimal(r.getDouble(2))).sum).toMap
    val totals = qty.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val dominant = qty.collect {
      case ((p, s), q) if q.toDouble > 0.5 * totals(p).toDouble => s
    }.toSet
    val nations = (1 to 5).map(i => s"NATION_$i").toSet
    val nationKeys = sf.nation.collect()
      .filter(r => nations.contains(r.getString(1))).map(_.getInt(0)).toSet
    val expect = sf.supplier.collect()
      .filter(r => nationKeys.contains(r.getInt(2)) && dominant.contains(r.getLong(0)))
      .map(_.getLong(0)).sorted
    assert(rows.map(_.getLong(0)).sorted.sameElements(expect))
  }

  test("q16/q20/q2/q11 plans are decorrelated: broadcast joins, no nested-loop, no cartesian") {
    Seq(Relational5.partSupplierCounts(sf), Relational5.dominantSuppliers(sf),
      Relational5.minCostSupplier(sf), Relational5.importantParts(sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin Inner"), plan)
    }
  }

  test("q2: every reported (part, supplier) offer is that part's regional minimum, ties kept") {
    import org.apache.spark.sql.functions.col
    val rows = Relational5.minCostSupplier(sf).collect()
    assert(rows.nonEmpty)
    // recount the min over ASIA suppliers for each reported part
    val asiaKey = sf.region.collect().find(_.getString(1) == "ASIA").get.getInt(0)
    val asiaNations = sf.nation.collect()
      .filter(_.getInt(2) == asiaKey).map(_.getInt(0)).toSet
    val asiaSupp = sf.supplier.collect()
      .filter(r => asiaNations.contains(r.getInt(2))).map(_.getLong(0)).toSet
    val offers = sf.lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
      .collect().filter(r => asiaSupp.contains(r.getLong(1)))
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => BigDecimal(r.getDouble(2))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).min).toMap
    rows.foreach { r =>
      val part = r.getLong(0)
      assert(BigDecimal(r.getDouble(3)) == offers(part),
        s"part $part cost ${r.getDouble(3)} != min ${offers(part)}")
    }
    // the part band actually filters
    val bandParts = sf.part.collect()
      .filter(r => r.getInt(4) >= 10 && r.getInt(4) <= 20 && r.getString(3) == "STANDARD")
      .map(_.getLong(0)).toSet
    assert(rows.forall(r => bandParts.contains(r.getLong(0))))
  }

  test("q11: reported parts are exactly those above twice the mean value") {
    val rows = Relational5.importantParts(sf).collect()
    assert(rows.nonEmpty)
    val values = rows.map(_.getDouble(1))
    // values descending with partkey tie-break
    assert(values.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    // the gate actually splits: fewer survivors than the full part count
    val allParts = sf.lineitem.select("l_partkey").distinct().count()
    assert(rows.length < allParts)
  }

  test("int8 quantization bounds the error by half a quantization step per dimension") {
    val rows = graft.operators.Embeddings.int8Quantize(sf).collect()
    assert(rows.nonEmpty)
    // per-dimension bounds recomputed by hand
    val byPos = rows.groupBy(_.getInt(1))
    byPos.foreach { case (_, dim) =>
      val xs = dim.map(_.getDouble(2))
      val (lo, hi) = (xs.min, xs.max)
      val step = (hi - lo) / 256.0
      dim.foreach { r =>
        val code = r.getInt(3)
        assert(code >= 0 && code <= 255)
        // midpoint dequantization error is at most half a step (+ float slack)
        assert(math.abs(r.getDouble(5)) <= step / 2 + 1e-9,
          s"err ${r.getDouble(5)} vs step $step")
      }
    }
  }

  test("range search returns exactly the pairs at or above tau, via broadcast") {
    val out = Similarity.rangeSearch(sf).collect()
    // subset: every returned pair clears the threshold
    out.foreach { r => assert(r.getDouble(2) >= 0.30 && r.getLong(0) != r.getLong(1)) }
    // completeness: brute-force replay over the collected vectors
    val vecs = sf.embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = for {
      (q, qv) <- vecs.toSeq if q < 20
      (v, vv) <- vecs.toSeq if v != q
      c = cos(vv, qv) if c >= 0.30
    } yield (q, v)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == expected.toSet)
    // ordering contract: per query, cosine desc then vec_id
    val sorted = out.map(r => (r.getLong(0), -r.getDouble(2), r.getLong(1)))
    assert(sorted.sameElements(sorted.sorted))
    // the query side broadcasts: no shuffle join on the corpus scan
    val plan = Similarity.rangeSearch(sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("matryoshka recall matches a full/truncated double-ranking replay") {
    import graft.operators.Embeddings
    val vecs = sf.embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val hits = for {
      (q, qv) <- vecs.toSeq if q < 20
      others = vecs.toSeq.filter(_._1 != q)
      full = others.map { case (v, vv) => (v, cos(vv, qv)) }
        .sortBy { case (v, c) => (-c, v) }.map(_._1).take(10).zipWithIndex.toMap
      trunc = others.map { case (v, vv) => (v, cos(vv.take(16), qv.take(16))) }
        .sortBy { case (v, c) => (-c, v) }.map(_._1).take(10).zipWithIndex.toMap
      v <- full.keys if trunc.contains(v)
    } yield (full(v) + 1, trunc(v) + 1)
    val got = Embeddings.matryoshkaRecall(sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (1 to 10).foreach { k =>
      val expect = hits.count { case (fr, tr) => fr <= k && tr <= k }.toDouble / (20 * k)
      assert(got(k) == expect, s"recall@$k")
    }
  }

  test("diverse sample fills each cluster's quota with its longest documents") {
    import graft.operators.Similarity
    val cells = Similarity.kmeansClusters(sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chars = sf.documents.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Similarity.diverseSample(sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // quota, rank contiguity, and ordering within each cell
    got.groupBy(_._1).foreach { case (cell, rows) =>
      assert(rows.length <= 10)
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).toSeq ==
        sorted.map(_._3).sortBy(-(_: Long)).toSeq, s"cell $cell order")
    }
    // replay: each cell's quota = its docs ranked by (n_chars desc, id)
    val expected = cells.toSeq.groupBy(_._2).flatMap { case (cell, ds) =>
      ds.map(_._1).sortBy(id => (-chars(id), id)).take(10)
        .zipWithIndex.map { case (id, i) => (cell, id, chars(id), i + 1) }
    }.toSet
    assert(got.toSet == expected)
    // diversity bites: every non-empty cell contributes
    assert(got.map(_._1).toSet == cells.values.toSet)
  }

  test("ivf-pq composes the coarse prune with ADC scoring consistently") {
    import graft.operators.{Embeddings, Similarity}
    val got = Similarity.ivfPqTopK(sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.length == 10)
    assert(!got.map(_._1).contains(0L))
    val dists = got.map(_._2).toSeq
    assert(dists == dists.sorted)
    // both IVF outputs draw from the SAME ≤4-cell probe set: their
    // result vectors' k-means cells must union to at most NumProbes
    val cells = Similarity.kmeansClusters(sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ivfCells = Similarity.ivfTopK(sf).collect().map(r => cells(r.getLong(0)))
    val pqCells = got.map(p => cells(p._1))
    assert((ivfCells ++ pqCells).toSet.size <= 4,
      "results must come from the shared probe-cell set")
    // the ADC score is index-independent: vectors appearing in BOTH the
    // global ADC top-10 and the IVF-PQ top-10 carry identical distances
    val globalAdc = Embeddings.pqAdcTopK(sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val common = got.filter(p => globalAdc.contains(p._1))
    common.foreach { case (id, d) =>
      assert(d == globalAdc(id), s"ADC score differs for vec $id")
    }
    // determinism across runs (two driver-trained models, both seeded)
    val again = Similarity.ivfPqTopK(sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.sameElements(again))
  }

  test("mmr rerank trades relevance for diversity on a crafted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mmr").toString
    // query q = x-axis; vec 1 ≈ vec 2 (near-identical, both most
    // relevant); vec 3 equally x-aligned but on the OPPOSITE side of
    // the y-axis, so sim(3,1) ≈ 0 while rel3 ≈ rel1. Pure relevance
    // ranks (1, 2, 3); MMR must demote the near-dup 2 below 3.
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    Seq(
      (0L, v(1.0, 0.0, 0.0)),
      (1L, v(0.72, 0.69, 0.0)),
      (2L, v(0.71, 0.70, 0.0)),
      (3L, v(0.70, -0.71, 0.0)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.mmrRerank(Tables(spark, dir)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L),
      s"expected near-dup demotion, got ${got.toSeq}")
    // relevance column is the plain cosine ordering; scores strictly fall
    assert(got.head._3 > got(2)._3)
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(-(_: Double)).toSeq)
  }

  test("binary topk ranks by exact sign-pattern hamming distance") {
    val vecs = sf.embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    val qv = vecs(0L)
    val exp = vecs.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      (id, v.zip(qv).count { case (x, y) => (x > 0.0) != (y > 0.0) })
    }.sortBy { case (id, h) => (h, id) }.take(10)
    val got = graft.operators.Similarity.binaryTopK(sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == exp, s"got $got")
    // the hamming tier must separate: not all distances equal
    assert(got.map(_._2).distinct.length > 1 || got.head._2 == 0)
  }

  test("kcenter sample matches a greedy farthest-point replay") {
    val vecs = sf.embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    def d(a: Array[Double], b: Array[Double]): Double =
      dot(a, a) - 2.0 * dot(b, a) + dot(b, b)
    var chosen = Vector((1, 0L, 0.0))
    for (rank <- 2 to 8) {
      val ids = chosen.map(_._2).toSet
      val (nid, nd) = vecs.keys.filterNot(ids).toSeq.map { id =>
        id -> ids.map(c => d(vecs(id), vecs(c))).min
      }.minBy { case (id, md) => (-md, id) }
      chosen = chosen :+ ((rank, nid, nd))
    }
    val got = graft.operators.Similarity.kcenterSample(sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toVector
    assert(got == chosen, s"first diff: ${got.zip(chosen).find(p => p._1 != p._2)}")
    // farthest-point property: selection distances never increase
    val ds = got.drop(1).map(_._3)
    assert(ds == ds.sortBy(-(_: Double)))
  }

  test("mmr rerank on the sf corpus: ranks contiguous, first pick = top cosine") {
    val got = Similarity.mmrRerank(sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (1 to 5))
    val top = Similarity.bruteForceTopK(sf).collect()(0)
    assert(got.head._2 == top.getLong(0) && got.head._3 == top.getDouble(1))
    // 5 distinct picks
    assert(got.map(_._2).distinct.length == 5)
  }

  test("filtered topk returns each label's own 5 best, matching a per-class replay") {
    val got = Similarity.filteredTopK(sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val labels = sf.embeddings.select("label").distinct().collect()
      .map(_.getInt(0)).sorted
    assert(got.map(_._1).distinct.sorted.sameElements(labels))
    // every class contributes exactly 5 ranked rows with descending cosine
    got.groupBy(_._1).foreach { case (l, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1 to 5), s"label $l ranks")
      val cs = rows.sortBy(_._2).map(_._4)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"label $l order")
    }
    // per-class winners equal a brute-force driver replay
    val vecs = sf.embeddings.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    val q = vecs.find(_._1 == 0L).get._3
    def cos(a: Array[Double], b: Array[Double]) = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val gotTop = got.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    labels.foreach { l =>
      val best = vecs.filter(v => v._2 == l && v._1 != 0L)
        .map(v => (cos(v._3, q), v._1))
        .maxBy { case (c, id) => (c, -id) }
      assert(gotTop(l) == best._2, s"label $l winner")
    }
  }

  test("hard negatives: per-anchor winners are the nearest different-label vectors") {
    val rows = Similarity.hardNegatives(sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4)))
    assert(rows.map(_._1).distinct.sorted.sameElements(0L until 8L))
    rows.groupBy(_._1).foreach { case (a, g) =>
      assert(g.map(_._2).sorted.sameElements(1 to 3), s"anchor $a")
    }
    val vecs = sf.embeddings.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]) = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val byAnchor = vecs.filter(_._1 < 8L)
    byAnchor.foreach { case (aid, albl, av) =>
      val expect = vecs
        .filter(v => v._1 != aid && v._2 != albl)
        .map(v => (cos(v._3, av), v._1))
        .sortBy { case (c, id) => (-c, id) }.take(3).map(_._2).toSeq
      val got = rows.filter(_._1 == aid).sortBy(_._2).map(_._3).toSeq
      assert(got == expect, s"anchor $aid")
      // every mined negative really has a different label
      rows.filter(_._1 == aid).foreach(r => assert(r._4 != albl))
    }
  }

  test("silhouette: scores bounded, cells partition the corpus, means consistent") {
    val rows = Similarity.silhouette(sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == sf.embeddings.count())
    rows.foreach { case (cell, n, mean, lo, hi) =>
      assert(n > 0)
      assert(lo >= -1.0 - 1e-12 && hi <= 1.0 + 1e-12, s"cell $cell bounds")
      assert(mean >= lo - 1e-9 && mean <= hi + 1e-9, s"cell $cell mean")
    }
    // cell ids match the kmeans clustering's cells with the same sizes
    val km = Similarity.kmeansClusters(sf).collect()
      .map(r => r.getInt(1) -> r.getLong(3))
      .groupBy(_._1).view.mapValues(_.head._2).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == km)
    val again = Similarity.silhouette(sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq == rows.map(r => (r._1, r._2, r._3)).toSeq)
  }
  test("hubness occurrences sum to the knn edge count and roles match thresholds") {
    val hub = Similarity.hubness(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val knn = Similarity.knnJoinLsh(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hub.length == sf.embeddings.count())
    assert(hub.map(_._2).sum == knn.length)
    // recount N_k from the ranked graph
    val occ = knn.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    hub.foreach { case (id, nk, role) =>
      assert(nk == occ.getOrElse(id, 0L), s"vec $id")
      val exp = if (nk >= 6) "hub" else if (nk == 0) "antihub" else "normal"
      assert(role == exp)
    }
  }

  test("nn-descent never degrades the seed graph and lifts recall vs exact knn") {
    def lists(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view
        .mapValues(_.sortBy(x => (-x._3, x._2)).map(x => (x._2, x._3)).toSeq)
        .toMap
    val seed = lists(Similarity.knnJoinLsh(sf).collect())
    val refined = lists(Similarity.nnDescent(sf).collect())
    val exact = lists(Similarity.knnJoin(sf).collect())
    // candidate superset => per-rank cosine dominates the seed
    refined.foreach { case (id, nbs) =>
      val sd = seed.getOrElse(id, Seq.empty)
      nbs.zip(sd).foreach { case ((_, cR), (_, cS)) =>
        assert(cR >= cS - 1e-12, s"vec $id refined $cR < seed $cS") }
    }
    def recall(approx: Map[Long, Seq[(Long, Double)]]) = {
      val hits = exact.toSeq.map { case (id, ex) =>
        val ap = approx.getOrElse(id, Seq.empty).map(_._1).toSet
        ex.count(e => ap.contains(e._1)).toDouble / ex.size
      }
      hits.sum / hits.size
    }
    val (rSeed, rRef) = (recall(seed), recall(refined))
    assert(rRef >= rSeed - 1e-12, s"recall fell: $rSeed -> $rRef")
    // sign-LSH over this synthetic corpus seeds weakly; the round must
    // still deliver a usable graph (floor), and never lose ground (above)
    assert(rRef > 0.15, s"refined recall $rRef suspiciously low (seed $rSeed)")
  }
  test("knn classify votes and split are mechanically sound") {
    val rows = Similarity.knnClassify(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    // every classified vector is test-side (hash >= 0.8), no duplicates
    assert(rows.map(_._1).distinct.length == rows.length)
    def unitHash(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0
    }
    rows.foreach { case (id, label, pred, votes, correct) =>
      assert(unitHash(id) >= 0.8, s"vec $id is train-side")
      assert(votes >= 1 && votes <= 3)
      assert(correct == (pred == label))
      assert(pred >= 0 && pred <= 9)
    }
  }

  test("snapshot diff covers all change classes with consistent values") {
    val rows = graft.operators.Etl.snapshotDiff(sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        BigDecimal(r.getLong(4)), BigDecimal(r.getLong(5))))
    val byType = rows.groupBy(_._2)
    assert(Set("added", "removed", "changed", "unchanged").subsetOf(byType.keySet))
    rows.foreach { case (k, ct, ao, bo, at, bt) =>
      ct match {
        case "added"     => assert(ao == 0 && at == 0 && bo > 0)
        case "removed"   => assert(bo == 0 && bt == 0 && ao > 0)
        case "unchanged" => assert(ao == bo && at == bt && ao > 0)
        case "changed"   => assert(ao > 0 && bo > 0 && (ao != bo || at != bt))
      }
    }
    // the two windows jointly cover every ship date, so the diff keys
    // are exactly the orders with any lineitem
    val c = sf.lineitem.select("l_orderkey").distinct().count()
    assert(rows.length == c)
  }
  test("topic clusters report k cells with ranked alpha terms") {
    val rows = graft.operators.Similarity.topicClusters(sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getString(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // cluster sizes partition the corpus
    val sizes = rows.groupBy(_._1).view.mapValues(_.head._2).toMap
    assert(sizes.values.sum == sf.embeddings.count())
    rows.groupBy(_._1).foreach { case (cell, ts) =>
      val sorted = ts.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to sorted.length))
      assert(sorted.length <= 5)
      // ranks follow (tf desc, term asc)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._5 > b._5 || (a._5 == b._5 && a._4 < b._4)
        case _           => true
      }, s"cell $cell rank order")
      sorted.foreach { case (_, _, _, term, tf) =>
        assert(term.length >= 4 && term.forall(c => c >= 'a' && c <= 'z'))
        assert(tf >= 1)
      }
    }
  }

  test("semdedup: keep-first within cells, sentinel and flag consistency") {
    val rows = Similarity.semDedup(sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.length == sf.embeddings.count().toInt)
    rows.foreach { case (_, _, n, mc, keep) =>
      assert(keep == (n == 0L))
      if (keep) assert(mc == 0.0) else assert(mc >= 0.4 && n >= 1)
    }
    assert(rows.exists(_._5) && rows.exists(!_._5), "threshold must split")
    // the lowest id of every cell has no earlier same-cell vector
    rows.groupBy(_._2).foreach { case (cell, members) =>
      val first = members.minBy(_._1)
      assert(first._5, s"cell $cell lowest id ${first._1} must be kept")
    }
  }

  test("graph search: split, ranks, and greedy-walk invariants hold") {
    def unitHash(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0
    }
    val vecs = sf.embeddings
      .selectExpr("vec_id", "cast(embedding as array<double>) AS embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val baseIds = vecs.keySet.filter(id => unitHash(id) < 0.8)
    val queryIds = vecs.keySet -- baseIds
    val entry = baseIds.min
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = Similarity.graphSearch(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQ = rows.groupBy(_._1)
    // every query gets results; only queries are queried; only base
    // vectors are returned
    assert(byQ.keySet == queryIds, s"queried ${byQ.keySet.size} vs ${queryIds.size}")
    rows.foreach { case (q, nb, _, _) =>
      assert(!baseIds.contains(q) && baseIds.contains(nb), s"split violated: $q -> $nb")
    }
    byQ.foreach { case (q, nbs) =>
      val sorted = nbs.sortBy(_._4)
      // contiguous ranks from 1, at most SearchK, descending cosine with
      // the nb_id tie-break, no duplicate results
      assert(sorted.map(_._4).sameElements(1 to sorted.length))
      assert(sorted.length <= 5)
      assert(sorted.map(_._2).distinct.length == sorted.length)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), s"order: $a vs $b")
        case _ =>
      }
      // the cosine column is the exact cosine of the claimed pair
      nbs.foreach { case (_, nb, c, _) => assert(c == cos(vecs(q), vecs(nb))) }
      // greedy monotonicity: the beam always retains its best-ever
      // candidate, and it starts at the entry — so rank 1 can never be
      // worse than the entry point itself
      assert(sorted.head._3 >= cos(vecs(q), vecs(entry)),
        s"query $q rank-1 worse than entry")
    }
    // the walk genuinely moves: some query must find a better neighbour
    // than the shared entry point
    assert(byQ.exists { case (q, nbs) =>
      nbs.exists(r => r._3 > cos(vecs(q), vecs(entry)))
    }, "no query improved over the entry — the walk never expanded")
  }

  test("ivf sweep: monotone candidates and recall, nprobe=NumProbes ⊇ ivf_topk") {
    val rows = Similarity.ivfSweep(sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4))
    // more probes can only widen the candidate set and never lose recall
    rows.sliding(2).foreach {
      case Array((_, c1, r1), (_, c2, r2)) =>
        assert(c2 >= c1, "candidates must be monotone in nprobe")
        assert(r2 >= r1 - 1e-12, "recall must be monotone in nprobe")
      case _ =>
    }
    rows.foreach { case (_, c, r) =>
      assert(r >= 0.0 && r <= 1.0)
      assert(c >= 0L && c < sf.embeddings.count())
    }
    // the nprobe=4 sweep point reproduces ivfTopK's recall@10 exactly:
    // same probe set, same rerank
    val truth = Similarity.bruteForceTopK(sf).collect().map(_.getLong(0)).toSet
    val ivf10 = Similarity.ivfTopK(sf).collect().map(_.getLong(0)).toSet
    val expected = ivf10.count(truth).toDouble / 10.0
    assert(math.abs(rows.last._3 - expected) < 1e-12,
      s"sweep@4 ${rows.last._3} vs ivf_topk $expected")
  }

  test("cell balance sums to the corpus and agrees with kmeans cluster sizes") {
    val rows = Similarity.cellBalance(sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val n = sf.embeddings.count()
    assert(rows.values.map(_._1).sum == n)
    rows.foreach { case (c, (cnt, share, lf)) =>
      assert(math.abs(share - cnt.toDouble / n) < 1e-12, s"cell $c share")
      assert(math.abs(lf - cnt.toDouble * 16 / n) < 1e-12, s"cell $c lf")
    }
    // same partition as the kmeans clusters query (shared model)
    val sizes = Similarity.kmeansClusters(sf).collect()
      .groupBy(_.getInt(1)).view.mapValues(_.length.toLong).toMap
    assert(rows.map { case (c, v) => c -> v._1 } == sizes)
  }

  test("two_nn matches an exact in-memory 2-NN replay") {
    import spark.implicits._
    val vecs = sf.embeddings
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dsq(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }; s
      }
      dot(a, a) + dot(b, b) - 2.0 * dot(a, b)
    }
    val got = Similarity.twoNn(sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // anchor stride derives from the corpus count (~128-anchor target,
    // the r13 linear-work rule)
    val mod = math.max(1L, vecs.size / 128)
    val anchors = vecs.keys.filter(_ % mod == 0)
    anchors.foreach { a =>
      val ds = vecs.toSeq.filter(_._1 != a)
        .map { case (c, v) => (dsq(vecs(a), v), c) }.sorted.take(2)
      val (d1s, d2s) = (ds(0)._1, ds(1)._1)
      if (d1s > 0) {
        val (d1, d2, mu) = got(a)
        assert(math.abs(d1 - math.sqrt(d1s)) < 1e-9, s"anchor $a d1")
        assert(math.abs(d2 - math.sqrt(d2s)) < 1e-9, s"anchor $a d2")
        assert(mu >= 1.0 && math.abs(mu - d2 / d1) < 1e-12, s"anchor $a mu")
      } else assert(!got.contains(a), s"degenerate anchor $a not excluded")
    }
    assert(got.keySet.subsetOf(anchors.toSet))
  }
}
