package graft

import java.sql.Timestamp

import graft.sources.Sinks
import graft.streaming.Streams
import graft.streaming.Streams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.lit

/** Pins the streaming-manifest compaction contract
  * ([[graft.sources.Sinks.compactManifestTable]]): a table grown by
  * [[graft.streaming.Streams.manifestAppendStream]] across many
  * micro-batches folds into a bounded number of dirs, and
  * [[graft.sources.Sinks.readPruned]] serves EXACT range results
  * before, during (both staged-swap states, injected via the hooks),
  * and after the fold — plus crash recovery from every phase.
  */
class ManifestCompactSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2025-01-01 10:${minute % 60}%02d:00")

  /** Grow a manifest table with `n` value-clustered micro-batches
    * (batch i carries values i*10 .. i*10+7), returning the table dir.
    */
  private def grow(n: Int, dir: String, from: Int = 0): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.manifestAppendStream(
        input.toDF(), Seq("value"), dir, maxRecordsPerFile = 4)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-mc-ckpt").toString)
      .start()
    (from until from + n).foreach { b =>
      input.addData((0 to 7).map(j =>
        Event((b * 10 + j).toLong, ts(b), "a", (b * 10 + j).toDouble)): _*)
      q.processAllAvailable()
    }
    q.stop()
  }

  /** Planted ids in [lo,hi]: batch b carries values b*10 .. b*10+7. */
  private def planted(lo: Long, hi: Long): Seq[Long] =
    (lo to hi).filter(_ % 10 <= 7)

  /** The rows a [lo,hi] value scan actually returns. */
  private def expect(dir: String, lo: Double, hi: Double): Seq[Long] =
    Sinks.readPruned(spark, dir, "value", lit(lo), lit(hi))
      .select("user_id").as[Long].collect().sorted.toSeq

  private def visibleDirs(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isDirectory && !f.getName.startsWith("_"))
      .map(_.getName).sorted

  private def manifestEntries(dir: String): Seq[String] =
    new java.io.File(s"$dir/_manifest").listFiles().toSeq
      .map(_.getName).sorted

  test("10-batch table folds to one generation; pruned reads exact at every stage") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mc").toString + "/t"
    grow(10, dir)
    assert(visibleDirs(dir).size == 10 && manifestEntries(dir).size == 10)
    val before = expect(dir, 23.0, 41.0)
    assert(before == planted(23L, 41L), s"pre-compact scan wrong: $before")
    // hooks observe the two in-flight states: new data visible but
    // unreferenced (old view must serve), then new manifest live with
    // old dirs still on disk (new view must serve, exactly once)
    var duringStaged: Seq[Long] = Nil
    var duringCleanup: Seq[Long] = Nil
    var cleanupFiles: Seq[String] = Nil
    // tiny target so the fold writes SEVERAL files — the pruning
    // assertion below needs a multi-file generation to mean anything
    val (nBefore, nAfter) = Sinks.compactManifestTable(
      spark, dir, targetFileBytes = 2048L, keepLastBatches = 0,
      beforeManifestSwap = () => { duringStaged = expect(dir, 23.0, 41.0) },
      beforeCleanup = () => {
        duringCleanup = expect(dir, 23.0, 41.0)
        cleanupFiles = Sinks.readPruned(spark, dir, "value",
          lit(23.0), lit(41.0)).inputFiles.toSeq
      })
    assert(nBefore == 10 && nAfter == 1, s"entries $nBefore -> $nAfter")
    assert(duringStaged == planted(23L, 41L),
      s"staged-data state must serve the OLD view exactly: $duringStaged")
    assert(duringCleanup == planted(23L, 41L),
      s"post-swap state must serve the NEW view exactly: $duringCleanup")
    // the post-swap read came from the new generation, not the old dirs
    assert(cleanupFiles.nonEmpty && cleanupFiles.forall(_.contains("/c0/")),
      s"post-swap reads must hit only c0 files: $cleanupFiles")
    // after: bounded layout, exact results, pruning still effective
    assert(visibleDirs(dir) == Seq("c0"))
    assert(manifestEntries(dir) == Seq("c0"))
    assert(expect(dir, 23.0, 41.0) == planted(23L, 41L))
    assert(expect(dir, 0.0, 1000.0).size == 80)
    assert(expect(dir, -5.0, -1.0).isEmpty)
    val prunedFiles = Sinks.readPruned(
      spark, dir, "value", lit(23.0), lit(41.0)).inputFiles.length
    val allFiles = spark.read.option("recursiveFileLookup", "true")
      .parquet(dir).inputFiles.length
    assert(allFiles > 1 && prunedFiles < allFiles,
      s"re-clustered zones must still prune: $prunedFiles of $allFiles")
  }

  test("repeated folds keep one generation; hot batches survive; small folds no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mc2").toString + "/t"
    grow(4, dir)
    Sinks.compactManifestTable(spark, dir, 64L * 1024)
    // the stream keeps appending after the first fold
    grow(3, dir, from = 4)
    assert(manifestEntries(dir).size == 4) // c0 + b0..b2 of the new run
    // keepLastBatches leaves the hottest batch un-folded
    val (b2, a2) = Sinks.compactManifestTable(
      spark, dir, 64L * 1024, keepLastBatches = 1)
    assert(b2 == 4 && a2 == 2, s"expected c1 + 1 hot batch, got $b2 -> $a2")
    assert(manifestEntries(dir).toSet == Set("c1", "b2"))
    assert(expect(dir, 0.0, 1000.0).size == 56)
    assert(expect(dir, 42.0, 55.0) == planted(42L, 55L))
    // nothing foldable (one gen + one hot batch, keep=1) -> no-op
    val (b3, a3) = Sinks.compactManifestTable(
      spark, dir, 64L * 1024, keepLastBatches = 1)
    assert(b3 == 2 && a3 == 2)
    assert(manifestEntries(dir).toSet == Set("c1", "b2"))
  }

  test("pruned read stream: catch-up + live tail deliver exact rows, misses open nothing") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-mc4").toString + "/t"
    val out = java.nio.file.Files.createTempDirectory("graft-mc4-out").toString
    val input = MemoryStream[Event]
    val q = Streams.manifestAppendStream(
        input.toDF(), Seq("value"), dir, maxRecordsPerFile = 4)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-mc4-ck").toString)
      .start()
    (0 to 3).foreach { b =>
      input.addData((0 to 7).map(j =>
        Event((b * 10 + j).toLong, ts(b), "a", (b * 10 + j).toDouble)): _*)
      q.processAllAvailable()
    }
    // tail the manifest for [13, 52]: b0 misses entirely, b1..b3 hit
    val tail = Streams.prunedReadStream(
        spark, dir, "value", lit(13.0), lit(52.0), out)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-mc4-tck").toString)
      .start()
    tail.processAllAvailable()
    def delivered(): Seq[Long] = {
      val fs = new java.io.File(out).listFiles()
      if (fs == null || fs.isEmpty) Nil
      else spark.read.option("recursiveFileLookup", "true").parquet(out)
        .select("user_id").as[Long].collect().sorted.toSeq
    }
    def outDirs(): Int = new java.io.File(out).listFiles().count(_.isDirectory)
    assert(delivered() == planted(13L, 37L), s"catch-up wrong: ${delivered()}")
    // live appends: b4 (40..47) and b5 (50..57, clipped at 52) hit
    (4 to 5).foreach { b =>
      input.addData((0 to 7).map(j =>
        Event((b * 10 + j).toLong, ts(b), "a", (b * 10 + j).toDouble)): _*)
      q.processAllAvailable()
      tail.processAllAvailable()
    }
    assert(delivered() == planted(13L, 52L), s"live tail wrong: ${delivered()}")
    // an entirely-out-of-range batch opens no data file and writes nothing
    val dirsBefore = outDirs()
    input.addData((0 to 7).map(j =>
      Event((60 + j).toLong, ts(6), "a", (60 + j).toDouble)): _*)
    q.processAllAvailable()
    tail.processAllAvailable()
    assert(outDirs() == dirsBefore,
      "a miss batch must not produce an output dir (no data file opened)")
    assert(delivered() == planted(13L, 52L))
    tail.stop(); q.stop()
  }

  test("crash at every phase recovers on the next call with exact reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mc3").toString + "/t"
    grow(6, dir)
    val boom = new RuntimeException("injected crash")
    // crash AFTER data staged into place, BEFORE the manifest swap:
    // the unreferenced generation is garbage the next call removes
    intercept[RuntimeException] {
      Sinks.compactManifestTable(spark, dir, 64L * 1024,
        beforeManifestSwap = () => throw boom)
    }
    assert(expect(dir, 11.0, 25.0) == planted(11L, 25L)) // old view intact
    // crash AFTER the swap, BEFORE old dirs are deleted: the next call
    // finishes the cleanup from the _pending_delete record
    intercept[RuntimeException] {
      Sinks.compactManifestTable(spark, dir, 64L * 1024,
        beforeCleanup = () => throw boom)
    }
    assert(expect(dir, 11.0, 25.0) == planted(11L, 25L)) // new view already live
    val (b, a) = Sinks.compactManifestTable(spark, dir, 64L * 1024)
    // the recovery fold sees one manifest entry (the crashed run's gen)
    assert(a == 1 && manifestEntries(dir).size == 1)
    assert(visibleDirs(dir).size == 1, s"folded dirs not cleaned: ${visibleDirs(dir)}")
    assert(expect(dir, 11.0, 25.0) == planted(11L, 25L))
    assert(expect(dir, 0.0, 1000.0).size == 48)
    // crash BETWEEN the two swap renames (manifest momentarily absent):
    // simulate by staging the tree out by hand; recovery restores it
    val fs = new java.io.File(s"$dir/_manifest")
    assert(fs.renameTo(new java.io.File(s"$dir/_manifest_prev")))
    Sinks.compactManifestTable(spark, dir, 64L * 1024)
    assert(expect(dir, 11.0, 25.0) == planted(11L, 25L))
  }

  /** Hand-commit one extra micro-batch the way
    * [[graft.streaming.Streams.manifestAppendStream]] would: data dir +
    * zone-rows JSON under _manifest. Used where a fresh MemoryStream's
    * restarting batch ids (b0, b1, …) would collide with dirs already
    * on disk.
    */
  private def handBatch(dir: String, name: String, b: Int): Unit = {
    import org.apache.spark.sql.functions._
    (0 to 7).map(j => Event((b * 10 + j).toLong, ts(b), "a",
      (b * 10 + j).toDouble)).toDF()
      .write.mode("overwrite").parquet(s"$dir/$name")
    spark.read.parquet(s"$dir/$name")
      .groupBy(input_file_name().as("file"))
      .agg(min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .coalesce(1)
      .write.mode("overwrite").json(s"$dir/_manifest/$name")
  }

  test("swap race: a batch that recreates _manifest between the two renames is merged, not swallowed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mc").toString + "/t"
    grow(6, dir)
    // the racing appender commits b100 INSIDE the swap window: its zone
    // entry lands in a freshly recreated _manifest dir, exactly the
    // HDFS-semantics hazard (rename would nest _manifest_next under it)
    val (nBefore, nAfter) = Sinks.compactManifestTable(
      spark, dir, targetFileBytes = 64L * 1024,
      betweenSwapRenames = () => handBatch(dir, "b100", 100))
    assert(nBefore == 6, s"entries before $nBefore")
    // merged outcome: the new generation AND the racing batch, no nest
    assert(manifestEntries(dir) == Seq("b100", "c0"),
      s"racing entry lost or nested: ${manifestEntries(dir)}")
    assert(!new java.io.File(s"$dir/_manifest/_manifest_next").exists())
    // both data sets serve: folded values 0..57 and the racer's 1000..1007
    assert(expect(dir, 0.0, 2000.0).size == 56)
    assert(expect(dir, 1000.0, 1007.0) == planted(1000L, 1007L))
    assert(expect(dir, 11.0, 25.0) == planted(11L, 25L))
    // the racer's data dir survived cleanup
    assert(visibleDirs(dir) == Seq("b100", "c0"))
  }

  test("retention window: folded dirs outlive the swap and are deleted only once aged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mc").toString + "/t"
    grow(6, dir)
    val hourMs = 3600L * 1000
    val (b0, a0) = Sinks.compactManifestTable(spark, dir, 64L * 1024,
      minAgeBeforeDeleteMs = hourMs)
    assert(b0 == 6 && a0 == 1)
    // manifest governs visibility: reads serve the new view exactly …
    assert(manifestEntries(dir) == Seq("c0"))
    assert(expect(dir, 11.0, 25.0) == planted(11L, 25L))
    assert(expect(dir, 0.0, 1000.0).size == 48)
    // … while the folded dirs stay on disk for in-flight old-plan readers
    assert(visibleDirs(dir).toSet == (0 to 5).map(i => s"b$i").toSet + "c0",
      s"folded dirs deleted inside the window: ${visibleDirs(dir)}")
    // an in-flight reader that planned against the OLD manifest can
    // still finish its scan of a folded file
    val oldFile = new java.io.File(s"$dir/b2").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getPath
    assert(spark.read.parquet(oldFile).count() == 4) // one 4-row file of b2
    // a fresh (un-aged) maintenance call leaves them alone
    Sinks.compactManifestTable(spark, dir, 64L * 1024,
      minAgeBeforeDeleteMs = hourMs)
    assert(visibleDirs(dir).size == 7)
    // age the fold marker past the window; the next call cleans up
    val marker = new java.io.File(s"$dir/c0/_pending_delete")
    assert(marker.setLastModified(System.currentTimeMillis() - 2 * hourMs))
    Sinks.compactManifestTable(spark, dir, 64L * 1024,
      minAgeBeforeDeleteMs = hourMs)
    assert(visibleDirs(dir) == Seq("c0"), s"aged dirs not cleaned: ${visibleDirs(dir)}")
    assert(!marker.exists())
    assert(expect(dir, 11.0, 25.0) == planted(11L, 25L))
  }

  test("fold fencing: a caught-up tail skips the rewrite; a lagging tail loses nothing; a fresh tail reads the fold") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-mc5").toString + "/t"
    val out = java.nio.file.Files.createTempDirectory("graft-mc5-out").toString
    val input = MemoryStream[Event]
    val q = Streams.manifestAppendStream(
        input.toDF(), Seq("value"), dir, maxRecordsPerFile = 4)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-mc5-ck").toString)
      .start()
    def feed(b: Int): Unit = {
      input.addData((0 to 7).map(j =>
        Event((b * 10 + j).toLong, ts(b), "a", (b * 10 + j).toDouble)): _*)
      q.processAllAvailable()
    }
    (0 to 3).foreach(feed)
    val tail = Streams.prunedReadStream(
        spark, dir, "value", lit(0.0), lit(1e6), out)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-mc5-tck").toString)
      .start()
    tail.processAllAvailable()
    def rows(o: String): Seq[Long] = {
      val fs = new java.io.File(o).listFiles()
      if (fs == null || fs.forall(!_.getName.startsWith("batch_id"))) Nil
      else spark.read.option("recursiveFileLookup", "true").parquet(o)
        .select("user_id").as[Long].collect().toSeq
    }
    assert(rows(out).sorted == planted(0L, 37L), "catch-up wrong")
    // fold while the tail is CAUGHT UP: the rewrite must be fenced out
    Sinks.compactManifestTable(spark, dir, 64L * 1024)
    tail.processAllAvailable()
    assert(rows(out).sorted == planted(0L, 37L),
      s"caught-up tail re-delivered the fold: ${rows(out).size} rows")
    // live append continues; only the new batch arrives
    feed(4)
    tail.processAllAvailable()
    assert(rows(out).sorted == planted(0L, 47L), "post-fold append wrong")
    // fold-of-fold: c1 folds [b4, c0]; the ledger recorded the skipped
    // c0 as delivered, so the fence works transitively
    Sinks.compactManifestTable(spark, dir, 64L * 1024)
    tail.processAllAvailable()
    assert(rows(out).sorted == planted(0L, 47L),
      "fold-of-fold re-delivered despite transitive ledger")
    tail.stop()
    // a FRESH tail (empty ledger) must read the fold like normal data
    val out2 = java.nio.file.Files.createTempDirectory("graft-mc5-o2").toString
    val tail2 = Streams.prunedReadStream(
        spark, dir, "value", lit(0.0), lit(1e6), out2)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-mc5-t2").toString)
      .start()
    tail2.processAllAvailable()
    tail2.stop()
    assert(rows(out2).sorted == planted(0L, 47L), "fresh tail missed the fold")
    // a LAGGING tail (fold lands before it saw b5/b6): delivers the
    // fold whole — duplicates allowed, loss not
    val out3 = java.nio.file.Files.createTempDirectory("graft-mc5-o3").toString
    val tail3 = Streams.prunedReadStream(
        spark, dir, "value", lit(0.0), lit(1e6), out3)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-mc5-t3").toString)
      .start()
    tail3.processAllAvailable() // caught up to c1
    feed(5); feed(6)            // NOT yet processed by tail3
    Sinks.compactManifestTable(spark, dir, 64L * 1024) // c2 folds [b5,b6,c1]
    tail3.processAllAvailable()
    tail3.stop(); q.stop()
    val got3 = rows(out3)
    assert(got3.toSet == planted(0L, 67L).toSet,
      s"lagging tail lost rows: ${got3.toSet.size} distinct of ${planted(0L, 67L).size}")
  }

  test("retention window: a deferred generation folded again has its pending list adopted, nothing stranded") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mc").toString + "/t"
    grow(4, dir)
    val hourMs = 3600L * 1000
    Sinks.compactManifestTable(spark, dir, 64L * 1024,
      minAgeBeforeDeleteMs = hourMs) // c0 folds b0..b3, deferred
    handBatch(dir, "b100", 100)
    handBatch(dir, "b101", 101)
    Sinks.compactManifestTable(spark, dir, 64L * 1024,
      minAgeBeforeDeleteMs = hourMs) // c1 folds c0+b100+b101, adopts b0..b3
    assert(manifestEntries(dir) == Seq("c1"))
    val pend = scala.io.Source.fromFile(s"$dir/c1/_pending_delete")
    val pendLines = try pend.getLines().toSet finally pend.close()
    assert(pendLines == Set("c0", "b100", "b101", "b0", "b1", "b2", "b3"),
      s"adoption incomplete: $pendLines")
    // a maintenance pass inside the window must not garbage-collect the
    // non-live c0 (it is referenced by c1's live pending list)
    Sinks.compactManifestTable(spark, dir, 64L * 1024,
      minAgeBeforeDeleteMs = hourMs)
    assert(visibleDirs(dir).contains("c0"),
      s"adopted dir garbage-collected early: ${visibleDirs(dir)}")
    // reads exact throughout: 4 grown batches + the two hand batches
    assert(expect(dir, 0.0, 2000.0).size == 48)
    assert(expect(dir, 1000.0, 1017.0).size == 16)
    // age c1's marker → everything deferred goes in one sweep
    val marker = new java.io.File(s"$dir/c1/_pending_delete")
    assert(marker.setLastModified(System.currentTimeMillis() - 2 * hourMs))
    Sinks.compactManifestTable(spark, dir, 64L * 1024,
      minAgeBeforeDeleteMs = hourMs)
    assert(visibleDirs(dir) == Seq("c1"),
      s"aged sweep incomplete: ${visibleDirs(dir)}")
    assert(expect(dir, 0.0, 2000.0).size == 48)
  }
}
