package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev tool: per-Spark-stage executor-time accounting for one
  * dedup_clusters run vs one dedup_ngram_jaccard run (not part of the
  * contract). Companion to [[ProfileClusters]]: that one splits wall
  * time by operator stage; this one asks which SPARK stages burn
  * cumulative task CPU — the number that turns into wall time on a
  * core-starved box.
  */
object ProfileClusters2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32)
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages += ((sc.stageInfo.name.takeWhile(_ != '\n').take(90),
          sc.stageInfo.taskMetrics.executorRunTime, sc.stageInfo.numTasks))
    })
    def run(label: String)(f: => Unit): Unit = {
      stages.clear()
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"== $label wall=${dt}%.2f s totalTask=${stages.map(_._2).sum / 1e3}%.1f s")
      stages.sortBy(-_._2).take(12).foreach { case (n, ms, nt) =>
        println(f"   ${ms / 1e3}%6.2f s  tasks=$nt%-4d $n")
      }
      spark.catalog.clearCache()
    }
    t.documents.count()
    run("warmup clusters") { operators.Dedup.clusters(t).count() }
    run("clusters rep2") { operators.Dedup.clusters(t).count() }
    run("clusters rep3") { operators.Dedup.clusters(t).count() }
    run("jaccard rep1") { operators.Dedup.ngramJaccard(t).count() }
    run("jaccard rep2") { operators.Dedup.ngramJaccard(t).count() }
    spark.stop()
  }
}
