package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev tool (not part of the contract): wall + task-CPU accounting for
  * pipeline_pretrain and its component stages, to attribute the r11
  * composition cost.
  */
object ProfilePretrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32)
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages += ((sc.stageInfo.name.takeWhile(_ != '\n').take(60),
          sc.stageInfo.taskMetrics.executorRunTime))
    })
    def run(label: String)(f: => Unit): Unit = {
      stages.clear()
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"== $label wall=${dt}%.2f s totalTask=${stages.map(_._2).sum / 1e3}%.1f s")
      spark.catalog.clearCache()
    }
    t.documents.count()
    run("warmup") { operators.Curation.pretrainPipeline(t).count() }
    run("pretrain") { operators.Curation.pretrainPipeline(t).count() }
    run("gopher") { operators.TextAnalysis2.gopherColumns(t.documents).count() }
    run("keepBest") { operators.Dedup.keepBest(t).count() }
    run("decontaminate") { operators.Curation.decontaminate(t).count() }
    run("wordpiece") { operators.TextAnalysis3.wordpiece(t).count() }
    run("pplGate") { operators.Curation.perplexityGate(t).count() }
    run("pretrain again") { operators.Curation.pretrainPipeline(t).count() }
    spark.stop()
  }
}
