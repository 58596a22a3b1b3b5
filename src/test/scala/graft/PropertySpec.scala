package graft

import graft.functions.{DotProduct, RollingHash, WordNGrams}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style hardening of the native expressions against their
  * declarative reference formulations, over fixed-seed random inputs.
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  private def randomText(): String = {
    val n = rng.nextInt(13)
    Seq.fill(n)(Seq.fill(1 + rng.nextInt(5))(('a' + rng.nextInt(26)).toChar).mkString)
      .mkString(" ")
  }

  test("WordNGrams equals the split+transform formulation on random texts") {
    val texts = Seq.fill(200)(randomText()) ++
      Seq("", " ", "  ", "a", "a b", "a b c", "a  b c", " a b c ")
    val df = texts.toDF("text")
    val native = df.select(WordNGrams(col("text"), 3)).as[Seq[String]].collect()
    val declarative = df.selectExpr(
      """CASE WHEN size(split(text, ' ')) >= 3 THEN
        |  transform(sequence(1, size(split(text, ' ')) - 2),
        |    i -> concat(element_at(split(text, ' '), i), ' ',
        |                element_at(split(text, ' '), i + 1), ' ',
        |                element_at(split(text, ' '), i + 2)))
        |ELSE cast(array() as array<string>) END""".stripMargin)
      .as[Seq[String]].collect()
    native.zip(declarative).zip(texts).foreach { case ((n, d), t) =>
      assert(n == d, s"for text '$t'")
    }
  }

  test("hi/lo pre-split long sums reconstruct the exact power sum on adversarial values") {
    // the identity q_corr_matrix's fast aggregate rests on: summing
    // (p >> 30) and (p & (2^30-1)) separately as longs and recombining
    // hi·2^30 + lo equals the exact Σp — including values straddling
    // the split boundary and the top of the cents-product range
    val B = 1L << 30
    val vals = Seq.fill(500)(math.abs(rng.nextLong()) % 110000000000000L) ++
      Seq(0L, 1L, B - 1, B, B + 1, 109999999999999L)
    val row = vals.toDF("p").agg(
      sum(shiftright(col("p"), 30)).as("hi"),
      sum(col("p").bitwiseAND(B - 1)).as("lo")).collect()(0)
    val reconstructed = BigInt(row.getLong(0)) * B + BigInt(row.getLong(1))
    assert(reconstructed == vals.map(BigInt(_)).sum)
  }

  test("decToDouble is exact below 2^53 and engine-stable on huge sums") {
    import org.apache.spark.sql.types.DecimalType
    // exact region: any integer below 2^53 must round-trip bit-perfectly
    val small = Seq.fill(300)(math.abs(rng.nextLong()) % (1L << 53)) ++
      Seq(0L, 1L, 999999999L, 1000000000L, 1000000001L, (1L << 53) - 1)
    val got = small.toDF("s")
      .select(col("s"), graft.functions.Exact.decToDouble(
        col("s").cast(DecimalType(38, 0))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    got.foreach { case (s, d) =>
      assert(d == s.toDouble, s"decToDouble($s) = $d")
    }
    // huge region (beyond 2^63, where a naive long path is impossible):
    // the recipe must equal the driver-side BigInt replay of the SAME
    // two IEEE ops — this is the contract the DuckDB oracles rely on
    val parts = Seq.fill(200)((math.abs(rng.nextLong()) % (1L << 40),
      math.abs(rng.nextLong()) % 1000000000L))
    val hugeDf = parts.toDF("hi", "lo")
      .select((col("hi").cast(DecimalType(38, 0)) * 1000000000L +
        col("lo")).as("s"))
      .agg(sum(col("s")).as("total"))
      .select(graft.functions.Exact.decToDouble(col("total")).as("d"))
    val expected = {
      val total = parts.map { case (h, l) => BigInt(h) * 1000000000L + l }.sum
      val lo = total % 1000000000L
      val hi = (total - lo) / 1000000000L
      hi.toDouble * 1.0e9 + lo.toDouble
    }
    assert(hugeDf.collect()(0).getDouble(0) == expected)
  }

  test("trailing-window EWMA fold equals the recursive definition") {
    // the aggregate-HOF fold q_ewma ships must equal the textbook
    // recurrence ewma_t = (ewma_{t-1} + x_t) / 2 applied over the same
    // trailing window, for any window length 1..20
    val xs = Seq.fill(60)(rng.nextDouble() * 100)
    ((1 to 3) ++ (4 to xs.length by 4)).foreach { t =>
      val win = xs.slice(math.max(0, t - 20), t)
      // coalesce(1): collect_list order is partition order, and the
      // reference recurrence needs the input order
      val sparkFold = win.toDF("v").coalesce(1)
        .agg(collect_list(col("v")).as("vals"))
        .selectExpr("aggregate(slice(vals, 2, 19), vals[0]," +
          " (acc, x) -> (acc + x) / 2) AS e")
        .collect()(0).getDouble(0)
      var acc = win.head
      win.tail.foreach(x => acc = (acc + x) / 2)
      assert(sparkFold == acc, s"at t=$t")
    }
  }

  test("RollingHash matches the JVM reference on random strings") {
    def ref(s: String): Long =
      s.getBytes("UTF-8")
        .foldLeft(BigInt(0))((h, b) => (h * 257 + (b & 0xFF)) % ((BigInt(1) << 61) - 1))
        .toLong
    val strs = Seq.fill(200)(rng.nextString(rng.nextInt(40))) ++
      Seq("", "\u0000", "πρόβλημα", "emoji 😀 test")
    val rows = strs.toDF("s").select(col("s"), RollingHash(col("s"))).collect()
    rows.foreach(r => assert(r.getLong(1) == ref(r.getString(0)), s"for '${r.getString(0)}'"))
  }

  test("JaccardSim equals the array_intersect/array_union formulation") {
    val docs = Seq.fill(150)((randomText().split(" ").toSeq, randomText().split(" ").toSeq)) ++
      Seq((Seq("a", "b", "a"), Seq("b", "b", "c")), (Seq("x"), Seq("x")), (Seq("x"), Seq("y")))
    val df = docs.toDF("a", "b")
    val native = df.select(graft.functions.JaccardSim(col("a"), col("b"))).collect()
    val builtin = df.selectExpr(
      "cast(size(array_intersect(a, b)) as double) / size(array_union(a, b))").collect()
    native.zip(builtin).zip(docs).foreach { case ((n, d), in) =>
      assert(n.getDouble(0) == d.getDouble(0), s"for $in")
    }
  }

  test("DotProduct matches a left fold on random vectors") {
    val pairs = Seq.fill(100)((
      Seq.fill(8)(rng.nextDouble() * 200 - 100),
      Seq.fill(8)(rng.nextDouble() * 200 - 100)))
    val got = pairs.toDF("a", "b")
      .select(DotProduct(col("a"), col("b"))).as[Double].collect()
    pairs.zip(got).foreach { case ((a, b), g) =>
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      assert(g == expected)
    }
  }

  test("KMV merge law holds for arbitrary splits and interleavings") {
    import graft.functions.{KmvIn, KmvMergeIn, KmvMerge, KmvSketch}
    val k = 8
    val sk = new KmvSketch(k)
    val mg = new KmvMerge(k)
    val rnd = new scala.util.Random(0xC0FFEE)
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(60)
      val hashes = Seq.fill(n)(rnd.nextLong().abs % 1000 + 1)
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val (l, r) = hashes.splitAt(cut)
      def sketch(hs: Seq[Long]): Vector[Long] =
        hs.foldLeft(sk.zero)((b, h) => sk.reduce(b, KmvIn(h)))
      // merge(sketch(A), sketch(B)) == sketch(A ++ B), any interleaving
      val merged = sk.merge(sketch(l), sketch(r))
      assert(merged == sketch(hashes))
      assert(merged == sk.merge(sketch(r), sketch(l)))
      // the merge level folds partial ARRAYS to the same state
      val viaArrays = mg.reduce(mg.reduce(mg.zero, KmvMergeIn(sketch(l))),
        KmvMergeIn(sketch(r)))
      assert(viaArrays == merged)
      // sub-k regime is exact
      if (hashes.distinct.length < k)
        assert(mg.finish(merged) == hashes.distinct.length.toLong)
    }
  }
}
