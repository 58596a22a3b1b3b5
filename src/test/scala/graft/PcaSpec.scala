package graft

import graft.operators.Embeddings

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("pca power recovers a planted dominant direction") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pca").toString
    // rank-1 data: x_k = t_k * d with zero-mean t -> covariance = Var(t) d d^T,
    // whose only nonzero eigenvector is d. Direction d lives in the
    // analyzed 16-dim prefix; trailing dims are zero.
    val d16 = Array(0.9, -0.6, 0.3, 0.1, 0.0, 0.2, -0.4, 0.05,
      0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val ts = Seq(-3.0, -1.0, 0.5, 1.5, 2.0) // mean 0
    ts.zipWithIndex.map { case (t, k) =>
      (k.toLong, (d16.map(x => (x * t).toFloat) ++ Array.fill(48)(0.0f)).toSeq, 0)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Embeddings.pcaPower(Tables(spark, dir)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 16)
    val v = rows.sortBy(_._1).map(_._3)
    // renormalized iterate: the largest-|.| coordinate sits exactly on
    // +/-1e6 micros
    assert(rows.map(r => math.abs(r._2)).max == 1000000L)
    // alignment with the planted direction (up to sign): |cos| > 0.999
    val dot = v.zip(d16).map { case (a, b) => a * b }.sum
    val nv = math.sqrt(v.map(x => x * x).sum)
    val nd = math.sqrt(d16.map(x => x * x).sum)
    assert(math.abs(dot) / (nv * nd) > 0.999,
      s"direction not recovered: ${v.toSeq}")
  }

  test("abtt removes the planted dominant direction almost entirely") {
    val dir = java.nio.file.Files.createTempDirectory("graft-abtt").toString
    // rank-1 corpus: after removing the recovered top direction, the
    // residual energy must be a tiny fraction of the centered energy
    val d16 = Array(0.9, -0.6, 0.3, 0.1, 0.0, 0.2, -0.4, 0.05,
      0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val ts = Seq(-3.0, -1.0, 0.5, 1.5, 2.0)
    ts.zipWithIndex.map { case (t, k) =>
      (k.toLong, (d16.map(x => (x * t).toFloat) ++ Array.fill(48)(0.0f)).toSeq, 0)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Embeddings.abtt(Tables(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == ts.length)
    rows.foreach { case (id, coef, resid) =>
      val centered2 = coef * coef + resid
      // residual ≤ 1% of the centered energy (direction is in micros,
      // so removal is near-total, not exact)
      assert(resid <= 0.01 * centered2 + 1e-12, s"vec $id resid $resid of $centered2")
    }
    // coefficients keep the spread of the planted scalars (t - mean(t))
    val coefs = rows.sortBy(_._1).map(_._2)
    assert(coefs.max > 1.0 && coefs.min < -1.0)
  }

  test("abtt on the sf corpus is deterministic with full corpus coverage") {
    val rows = Embeddings.abtt(sf).collect().map(_.toString)
    assert(rows.length == sf.embeddings.count())
    val again = Embeddings.abtt(sf).collect().map(_.toString)
    assert(rows.sameElements(again))
  }

  test("pca power on the sf corpus: 16 rows, unit-micros max, deterministic") {
    val rows = Embeddings.pcaPower(sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (0 until 16))
    assert(rows.map(r => math.abs(r._2)).max == 1000000L)
    val again = Embeddings.pcaPower(sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("random projection matches the exact signed left-fold replay") {
    val vecs = sf.embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val got = Embeddings.randomProjection(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == vecs.size * 16)
    got.foreach { case ((id, j), p) =>
      val v = vecs(id)
      val signed = v.indices.map(i =>
        if ((i * 31 + j * 17) % 2 == 0) v(i) else -v(i))
      val exp = signed.tail.foldLeft(signed.head)(_ + _)
      assert(p == exp, s"vec $id dim $j")
    }
    // JL sanity: projected squared distances approximate D/K-scaled
    // originals on average (not per-pair) — a loose 2x band on the mean
    val ids = vecs.keys.toSeq.sorted.take(20)
    val pairs = for (a <- ids; b <- ids if a < b) yield (a, b)
    def d2(x: Array[Double], y: Array[Double]) =
      x.indices.map(i => (x(i) - y(i)) * (x(i) - y(i))).sum
    val ratioMean = pairs.map { case (a, b) =>
      val orig = d2(vecs(a), vecs(b))
      val pa = (0L until 16L).map(j => got((a, j))).toArray
      val pb = (0L until 16L).map(j => got((b, j))).toArray
      (d2(pa, pb) / 16.0) / orig
    }.sum / pairs.length
    assert(ratioMean > 0.5 && ratioMean < 2.0, s"JL ratio $ratioMean")
  }
  test("dim corr reports the top pairs with an exact driver replay") {
    val rows = graft.operators.Embeddings.dimCorr(sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 20)
    rows.foreach { case (a, b, n, c) =>
      assert(a < b); assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(n == sf.embeddings.count())
    }
    // replay the quantized Pearson for the winning pair
    val (da, db, n0, c0) = rows.head
    val vs = sf.embeddings.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
    val qa = vs.map(v => math.floor(v(da) * 1e6).toLong)
    val qb = vs.map(v => math.floor(v(db) * 1e6).toLong)
    val n = qa.length.toDouble
    def bi(xs: Array[Long]) = xs.map(BigInt(_)).sum
    val (sa, sb) = (bi(qa), bi(qb))
    val saa = qa.map(x => BigInt(x) * x).sum
    val sbb = qb.map(x => BigInt(x) * x).sum
    val sab = qa.zip(qb).map { case (x, y) => BigInt(x) * y }.sum
    val expect = (n * sab.toDouble - sa.toDouble * sb.toDouble) /
      (math.sqrt(n * saa.toDouble - sa.toDouble * sa.toDouble) *
        math.sqrt(n * sbb.toDouble - sb.toDouble * sb.toDouble))
    assert(n0 == qa.length)
    assert(math.abs(c0 - expect) < 1e-9, s"pair ($da,$db): $c0 vs $expect")
    // ordering is |corr| descending
    val absC = rows.map(_._4.abs)
    assert(absC.zip(absC.tail).forall { case (x, y) => x >= y - 1e-12 })
  }
}
