package graft

import graft.functions.{DotProduct, RollingHash}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("HashedSortedGrams equals the sorted xxhash64 HOF form") {
    import org.apache.spark.sql.functions._
    val g = graft.functions.Shingles.gramsOf(sf.documents)
    val native = g.select($"doc_id",
      graft.functions.HashedSortedGrams(col("grams")).as("hg"))
    val hof = g.select($"doc_id",
      expr("array_sort(transform(grams, x -> xxhash64(x)))").as("hg"))
    assert(native.except(hof).isEmpty && hof.except(native).isEmpty)
  }

  // arbitrary-precision reference: the 61-bit Mersenne reduction in
  // RollingHash.step must equal plain modular arithmetic
  private def refRollingHash(s: String): Long =
    s.getBytes("UTF-8")
      .foldLeft(BigInt(0))((h, b) => (h * 257 + (b & 0xFF)) % ((BigInt(1) << 61) - 1))
      .toLong

  test("RollingHash codegen path matches the reference polynomial") {
    val rows = Seq("", "a", "abc", "hello world", "ünïcödé ≠ ascii").toDF("s")
      .select(col("s"), RollingHash(col("s")).as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == refRollingHash(r.getString(0)), s"for '${r.getString(0)}'")
    }
  }

  test("RollingHash interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val interp = graft.functions.RollingHash(Literal(UTF8String.fromString("hello world")))
      .eval(null).asInstanceOf[Long]
    assert(interp == refRollingHash("hello world"))
  }

  test("RollingHash is null-safe") {
    val r = Seq[Option[String]](None).toDF("s")
      .select(RollingHash(col("s"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("DotProduct matches sequential fold") {
    val a = Seq(1.0, 2.0, 3.5, -4.0)
    val b = Seq(0.5, -1.0, 2.0, 8.25)
    val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val got = Seq((a, b)).toDF("a", "b")
      .select(DotProduct(col("a"), col("b"))).as[Double].head()
    assert(got == expected)
  }

  test("DotProduct rejects non-double arrays at analysis") {
    val ex = intercept[Exception] {
      Seq((Seq("x"), Seq("y"))).toDF("a", "b")
        .select(DotProduct(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("dot_product") || ex.getMessage.contains("DATATYPE"))
  }

  test("KMV merge law: region rollup of nation sketches equals the direct region sketch") {
    import graft.operators.Relational3
    val t = sf
    val h = conv(substring(md5(col("o_custkey").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val x = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), h.as("ch"))
    val merged = udaf(
      new graft.functions.KmvMerge(256),
      org.apache.spark.sql.Encoders.product[graft.functions.KmvMergeIn])
    // single-level sketch built straight from raw hashes (1-element arrays)
    val direct = x.groupBy("r_name").agg(merged(array(col("ch"))).as("direct_est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rolled = Relational3.sketchMerge(t).collect()
    assert(rolled.nonEmpty)
    rolled.foreach { r =>
      assert(r.getLong(2) == direct(r.getString(0)),
        s"merge law broken for region ${r.getString(0)}")
      // sf0.001 regions hold fewer than k=256 distinct customers: the
      // sketch must be EXACT here (the estimation regime is exercised by
      // the sf0.01 driver oracle, where regions exceed k)
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("KMV set algebra: sub-k regime is exact; inclusion-exclusion is consistent") {
    import graft.operators.Relational3
    val r = Relational3.sketchSetOps(sf).collect()(0)
    val (estA, estB, estU, estI) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (exA, exB, exU, exI) =
      (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    // sf0.001 segments hold fewer than k=256 distinct customers — the
    // sketch algebra must be EXACT here (estimation regime covered by
    // the sf0.01 driver oracle)
    assert(estA == exA && estB == exB && estU == exU && estI == exI)
    assert(estI == math.max(0L, estA + estB - estU))
    assert(exU <= exA + exB && exU >= math.max(exA, exB))
  }
}
