package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev tool: per-stage wall-time breakdown for dedup_clusters (not part
  * of the contract). The round-9 verdict asked WHERE the driver-box
  * 11 s goes: this splits the operator into the four stages it named —
  * pair front-end materialization, the fused limit(N+1).collect()
  * probe, local union-find, and the final broadcast join-back — and
  * counts Spark jobs + cumulative executor task time per stage so a
  * slow box can be told apart from a dense dup graph.
  */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32)
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)

    @volatile var jobs = 0
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        taskMs += sc.stageInfo.taskMetrics.executorRunTime
    })
    def time[A](label: String)(f: => A): A = {
      val (j0, m0) = (jobs, taskMs)
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat before reading
      Thread.sleep(300)
      println(f"STAGE $label%-34s ${dt}%6.2f s  jobs=${jobs - j0}%-3d taskTime=${(taskMs - m0) / 1e3}%.1f s")
      r
    }

    // warm the readers like Bench does
    t.documents.count()

    // ---- end-to-end reference numbers (3 reps, like the bench) ----
    (1 to 3).foreach { i =>
      time(s"full clusters e2e rep$i") { operators.Dedup.clusters(t).count() }
      spark.catalog.clearCache()
    }
    time("pairs only (= dedup_ngram_jaccard)") { operators.Dedup.ngramJaccard(t).count() }
    spark.catalog.clearCache()

    // ---- the four stages the verdict named, timed in isolation ----
    val pairs = operators.Dedup.ngramJaccardPairs(t).select(
      col("a_id").as("x"), col("b_id").as("y"))
    val nPairs = time("1. pair front-end materialize") { pairs.cache(); pairs.count() }
    println(s"   pair count: $nPairs")
    val head = time("2. limit(N+1).collect()") { pairs.limit(1000001).collect() }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(a: Long): Long = {
      var r = a
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = a
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val labelDf = time("3. union-find (driver-local)") {
      head.foreach { r =>
        val (rx, ry) = (find(r.getLong(0)), find(r.getLong(1)))
        if (rx != ry) { if (rx < ry) parent(ry) = rx else parent(rx) = ry }
      }
      import spark.implicits._
      parent.keys.toSeq.map(k => (k, find(k))).toDF("id", "graph_lbl")
    }
    time("4. broadcast join-back + count") {
      t.documents.select(col("doc_id").as("id"))
        .join(broadcast(labelDf), Seq("id"), "left")
        .select(col("id"), coalesce(col("graph_lbl"), col("id")).as("lbl"))
        .count()
    }
    spark.catalog.clearCache()

    // ---- variant: skip the second cache layer (pairs is already
    // persisted by verifyJaccard; propagateLabels adds ep.cache()) ----
    time("variant: collect w/o ep.cache") {
      val p = operators.Dedup.ngramJaccardPairs(t)
        .select(col("a_id").as("x"), col("b_id").as("y"))
      p.limit(1000001).collect()
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
