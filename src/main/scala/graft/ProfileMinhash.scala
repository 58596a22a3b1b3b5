package graft

import graft.functions.Shingles
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the MinHash pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = Tables(spark, dir)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val g = Shingles.gramsOf(t.documents)
    time("grams count")(g.count())
    val ex = g.select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("h"))
    time("explode+hash count")(ex.count())
    var s = 0x243f6a8885a308d3L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    val mixB = (0 until 128).map(_ => next())
    val sigCols = (0 until 128).map(i => min(xxhash64(col("h").bitwiseXOR(lit(mixB(i))))).as(s"m$i"))
    val sig = ex.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    time("signatures")(sig.count())
    val bands = sig.select(col("doc_id"),
      posexplode(array((0 until 32).map { b =>
        xxhash64((b * 4 until (b + 1) * 4).map(i => col(s"m$i")): _*)
      }: _*)).as(Seq("band_idx", "band_hash")))
    time("bands")(bands.count())
    val ca = bands.select(col("doc_id").as("a_id"), col("band_idx"), col("band_hash"))
    val cb = bands.select(col("doc_id").as("b_id"), col("band_idx"), col("band_hash"))
    val candidates = ca.join(cb, Seq("band_idx", "band_hash"))
      .where(col("a_id") < col("b_id")).select("a_id", "b_id").distinct()
    time("candidates")(candidates.count())
    val withGrams = candidates
      .join(g.select(col("doc_id").as("a_id"), col("grams").as("a_grams")), Seq("a_id"))
      .join(g.select(col("doc_id").as("b_id"), col("grams").as("b_grams")), Seq("b_id"))
      .withColumn("jaccard", Shingles.jaccard(col("a_grams"), col("b_grams")))
      .where(col("jaccard") >= 0.6)
    time("verified")(withGrams.count())
    spark.stop()
  }
}
