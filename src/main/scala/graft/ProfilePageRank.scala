package graft

import org.apache.spark.sql.functions._

/** Dev tool: where does graph_pagerank's wall time go? */
object ProfilePageRank {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the scan paths like Bench does
    t.lineitem.count()
    time("pagerank run1")(operators.Graph.pageRank(t).count())
    spark.catalog.clearCache()
    time("pagerank run2")(operators.Graph.pageRank(t).count())
    spark.catalog.clearCache()
    val df = operators.Graph.pageRank(t)
    time("analyze+optimize only")(df.queryExecution.executedPlan)
    time("pagerank run3 (pre-planned)")(df.count())
    spark.stop()
  }
}
