package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Throwaway r17 profiling main. Delete at round close. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32)
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    t.embeddings.count()
    val vecs = t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint(true)

    def assignLit(cents: Seq[(Int, Seq[Double])]): DataFrame = {
      val scored = cents.map { case (id, c) =>
        val cc = c.map(x => x * x).sum
        struct(
          (lit(cc) - lit(2.0) * graft.functions.DotProduct(col("v"), typedLit(c)))
            .as("d"),
          lit(id).as("cell"))
      }
      vecs.withColumn("_best", array_min(array(scored: _*)))
        .withColumn("cell", col("_best.cell"))
        .withColumn("d", col("_best.d"))
        .drop("_best")
    }
    def meansOf(asg: DataFrame): Seq[(Int, Seq[Double])] =
      asg.select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(graft.functions.Exact.portableMean(col("x")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), expr("transform(pm, s -> s.m)").as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)

    val init = vecs.where(col("vec_id") < 16).orderBy("vec_id").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1))).toSeq
    // run the SAME two-iteration Lloyd twice: if iteration wall time
    // collapses on the second pass, it was codegen compilation
    for (rep <- 1 to 2) {
      var cents = init
      for (i <- 0 until 2) {
        cents = time(s"lloyd.iter$i rep$rep") { meansOf(assignLit(cents)) }
      }
    }
    // variant: assignment via broadcast centroid frame instead of literals
    import spark.implicits._
    def assignJoin(cents: Seq[(Int, Seq[Double])]): DataFrame = {
      val cdf = cents.map { case (id, c) =>
        (id, c, c.map(x => x * x).sum) }.toDF("cell0", "c", "cc")
      vecs.crossJoin(broadcast(cdf))
        .select(col("vec_id"), col("v"),
          struct((col("cc") - lit(2.0) *
            graft.functions.DotProduct(col("v"), col("c"))).as("d"),
            col("cell0").as("cell")).as("s"))
        .groupBy("vec_id", "v").agg(min(col("s")).as("_best"))
        .withColumn("cell", col("_best.cell"))
        .withColumn("d", col("_best.d"))
        .drop("_best")
    }
    for (rep <- 1 to 2) {
      var cents = init
      for (i <- 0 until 2) {
        cents = time(s"lloydJoin.iter$i rep$rep") { meansOf(assignJoin(cents)) }
      }
      println(s"[check] join-variant final cents == lit-variant: " +
        (cents == { var c2 = init; for (i <- 0 until 2) c2 = meansOf(assignLit(c2)); c2 }))
    }
    spark.stop()
  }
}
