package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev tool (not part of the contract): adjudicates the r10
  * dedup_ngram_jaccard watch item. Reps the query with per-Spark-stage
  * executor-time accounting, then reps the same pair pipeline with the
  * spread-scan bypassed (documents read raw) to isolate whether the r10
  * adaptive scan spread (Tables.scala) moved the needle on THIS query.
  */
object ProfileJaccard {
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
      stages.sortBy(-_._2).take(10).foreach { case (n, ms, nt) =>
        println(f"   ${ms / 1e3}%6.2f s  tasks=$nt%-4d $n")
      }
      spark.catalog.clearCache()
    }
    t.documents.count()
    (1 to 4).foreach(i => run(s"jaccard rep$i") { operators.Dedup.ngramJaccard(t).count() })
    spark.stop()
  }
}
