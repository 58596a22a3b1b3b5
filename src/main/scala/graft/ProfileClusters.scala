package graft

import org.apache.spark.sql.functions._

/** Dev tool: stage timing for dedup_clusters (not part of the contract). */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32)
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the readers
    t.documents.count()
    time("full clusters run") { graft.operators.Dedup.clusters(t).count() }
    spark.catalog.clearCache()
    time("pairs only") { graft.operators.Dedup.ngramJaccard(t).count() }
    spark.catalog.clearCache()
    time("clusters again (cold)") { graft.operators.Dedup.clusters(t).count() }
    time("clusters warm-cache") { graft.operators.Dedup.clusters(t).count() }
    spark.stop()
  }
}
