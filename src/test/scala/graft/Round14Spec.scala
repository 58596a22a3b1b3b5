package graft

import graft.operators.Ranks
import org.apache.spark.sql.functions._

/** Specs for the round-14 fixes: the shared-RDD prefix-scan helper and
  * its determinism at sampling scale.
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  test("withGlobalPrefixAggs exact at sampling scale (one set of range bounds)") {
    // 200k rows over 32 shuffle partitions ≫ RangePartitioner's
    // per-partition reservoir (~60 rows at defaults): the sampler
    // genuinely subsamples, so if the totals job and the output job ran
    // the range shuffle twice with different bounds (the pre-r14 hazard:
    // reservoir seed = rdd.id, which differs per re-planned action),
    // rows would join offsets computed for a DIFFERENT _pid and the
    // prefix sums below would be wrong with overwhelming probability.
    val n = 200000
    // deterministic shuffled key order: id → (a·id + c) mod n is a
    // bijection because gcd(48271, 200000) = 1; values derived from key
    val df = spark.range(n)
      .select(((col("id") * 48271L + 12345L) % n).as("k"))
      .select(col("k"), (col("k") % 97).as("v"))
    val out = Ranks.withGlobalPrefixAggs(df, Seq(col("k")), Seq(
        ("cs", col("v"), "sum", true),
        ("pm", col("v"), "min", false)))
      .select("k", "cs", "pm").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[java.lang.Long]("pm")).map(_.toLong)))
      .sortBy(_._1)
    assert(out.length == n)
    // driver recompute: keys are a permutation of 0..n-1, v = k % 97
    var run = 0L
    var mn = Option.empty[Long]
    var k = 0L
    out.foreach { case (gk, cs, pm) =>
      assert(gk == k, s"rank order broke at $k")
      val v = k % 97
      assert(pm == mn, s"excl min at $k")
      run += v
      mn = Some(mn.fold(v)(math.min(_, v)))
      assert(cs == run, s"incl sum at $k: $cs vs $run")
      k += 1
    }
  }
}
