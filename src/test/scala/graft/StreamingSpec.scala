package graft

import java.sql.Timestamp

import graft.streaming.Streams
import graft.streaming.Streams.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{array_distinct, col, count, lit, sum, window}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2025-01-01 10:$minute%02d:00")

  test("stream-static enrichment joins events against broadcast dims per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(Event(1, ts(5), "click", 1.0), Event(7, ts(6), "view", 2.0))
    val dims = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val q = Streams.enrichStream(input.toDF(), dims, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enriched").collect()
    assert(rows.length == 2)
    val byUser = rows.map(r => r.getLong(0) -> r.getAs[String]("segment")).toMap
    assert(byUser(1L) == "gold")
    assert(byUser(7L) == null) // left join keeps unmatched events
  }

  test("pit join enriches facts with the event-time version; stream twin agrees") {
    import org.apache.spark.sql.functions.{expr, lead}
    import org.apache.spark.sql.expressions.Window
    // planted events: user 1 has versions (view) at :10 and :20;
    // purchases land before any version (:05), inside v100 (:15), ON
    // the v101 boundary (:20), and inside v101 (:25)
    val dir = java.nio.file.Files.createTempDirectory("graft-pit").toString
    Seq(
      (100L, ts(10), 1L, "view", 1.0, "{}"),
      (101L, ts(20), 1L, "view", 2.0, "{}"),
      (1L, ts(5), 1L, "purchase", 9.0, "{}"),
      (2L, ts(15), 1L, "purchase", 8.0, "{}"),
      (3L, ts(20), 1L, "purchase", 7.0, "{}"),
      (4L, ts(25), 1L, "purchase", 6.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.operators.Quality.pitJoin(Tables(spark, dir)).collect()
      .map(r => (r.getLong(0),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Double])))
    assert(batch.toSeq == Seq(
      (1L, None, None),
      (2L, Some(100L), Some(1.0)),
      (3L, Some(101L), Some(2.0)),
      (4L, Some(101L), Some(2.0))), s"batch got ${batch.toList}")

    // stream twin: the same dimension frame, facts arriving OUT OF
    // ORDER across two micro-batches — event-time versioning must hold
    val events = Tables(spark, dir).events
    val base = events.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("version_id"),
        col("value").as("state_value"), col("ts").as("valid_from"))
    val dim = base.withColumn("valid_to",
      lead(col("valid_from"), 1).over(
        Window.partitionBy("user_id").orderBy("valid_from", "version_id")))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.scd2EnrichStream(input.toDF(), dim)
      .writeStream.format("memory").queryName("pit_stream")
      .outputMode("append").start()
    input.addData(Event(1, ts(25), "purchase", 6.0))
    q.processAllAvailable()
    // late arrivals: facts OLDER than the already-seen :25 still enrich
    // against their own event-time versions
    input.addData(Event(1, ts(15), "purchase", 8.0),
      Event(1, ts(5), "purchase", 9.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("pit_stream").collect()
      .map(r => (r.getAs[Double]("value"),
        Option(r.getAs[Any]("version_id")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("state_value")).map(_.asInstanceOf[Double])))
      .sortBy(-_._1)
    assert(got.toSeq == Seq(
      (9.0, None, None),
      (8.0, Some(100L), Some(1.0)),
      (6.0, Some(101L), Some(2.0))), s"stream got ${got.toList}")
  }

  test("tumbling window aggregate over a stream matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(5), "click", 1.0),
      Event(1, ts(10), "click", 2.0),
      Event(2, ts(15), "view", 5.0))
    val q = Streams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tumbling").collect()
    val clicks = rows.find(_.getString(1) == "click").get
    assert(clicks.getLong(2) == 2 && clicks.getDouble(3) == 3.0)
    val views = rows.find(_.getString(1) == "view").get
    assert(views.getLong(2) == 1)
  }

  test("windowed distinct-user sketch: stream estimate equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts(5), "click", 1.0), Event(2, ts(10), "click", 1.0),
      Event(1, ts(12), "click", 1.0), // repeat user inside the window
      Event(3, ts(20), "view", 1.0), Event(3, ts(25), "view", 1.0))
    val input = MemoryStream[Event]
    input.addData(events: _*)
    val q = Streams.distinctCountsStream(input.toDF())
      .writeStream.format("memory").queryName("dcounts")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dcounts").collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    // batch twin over the same rows — identical sketch estimate
    val batch = events.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(org.apache.spark.sql.functions.approx_count_distinct(col("user_id"))
        .as("au"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == batch, s"stream $got vs batch $batch")
    // tiny cardinalities: the sketch is exact here
    assert(got("click") == ((2L, 3L)) && got("view") == ((1L, 2L)))
  }

  test("file-source stream: new JSONL files flow through the windowed agg") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "batch1.jsonl"),
      """{"user_id":1,"ts":"2025-01-01T10:05:00Z","event_type":"click","value":2.5}
        |{"user_id":2,"ts":"2025-01-01T10:20:00Z","event_type":"click","value":1.5}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE")
    val stream = spark.readStream.schema(schema).json(dir)
    val q = Streams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("filestream")
      .outputMode("update").start()
    q.processAllAvailable()
    // a second file arrives later — the stream picks it up incrementally
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "batch2.jsonl"),
      """{"user_id":3,"ts":"2025-01-01T10:40:00Z","event_type":"click","value":6.0}
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("filestream").collect()
    val latest = rows.filter(_.getString(1) == "click").maxBy(_.getLong(2))
    assert(latest.getLong(2) == 3 && latest.getDouble(3) == 10.0)
  }

  test("stream-stream interval join pairs purchases with recent views") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val views = MemoryStream[Event]
    purchases.addData(Event(1, ts(30), "purchase", 100.0))
    views.addData(
      Event(1, ts(10), "view", 1.0),   // 20 min before: joins
      Event(1, ts(40), "view", 2.0),   // after the purchase: must not join
      Event(2, ts(29), "view", 3.0))   // other user: must not join
    val q = Streams.purchaseViewJoin(purchases.toDF(), views.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssjoin").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("v_value") == 1.0)
  }

  test("stream-stream LEFT OUTER join emits unmatched purchases after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val views = MemoryStream[Event]
    purchases.addData(
      Event(1, ts(30), "purchase", 100.0),  // has a matching view
      Event(3, ts(31), "purchase", 50.0))   // NO view: must surface with nulls
    views.addData(Event(1, ts(10), "view", 1.0))
    val q = Streams.purchaseViewLeftJoin(purchases.toDF(), views.toDF())
      .writeStream.format("memory").queryName("ssleft")
      .outputMode("append").start()
    q.processAllAvailable()
    // advance BOTH watermarks far past the interval so the engine can
    // prove no view for user 3 will ever arrive
    purchases.addData(Event(9, Timestamp.valueOf("2025-01-01 16:00:00"), "purchase", 1.0))
    views.addData(Event(9, Timestamp.valueOf("2025-01-01 16:00:00"), "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssleft").collect()
    val byUser = rows.groupBy(_.getAs[Long]("p_user"))
    assert(byUser(1L).exists(_.getAs[Double]("v_value") == 1.0))
    val unmatched = byUser(3L)
    assert(unmatched.length == 1 && unmatched.head.isNullAt(
      unmatched.head.fieldIndex("v_value")), rows.mkString("; "))
  }

  test("streaming CDC upsert materializes latest state per key via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-supsert").toString + "/state"
    val input = MemoryStream[Event]
    input.addData(Event(1, ts(0), "click", 1.0), Event(2, ts(1), "view", 2.0))
    val q = Streams.upsertStream(input.toDF(), out, "user_id", "ts").start()
    q.processAllAvailable()
    input.addData(Event(1, ts(30), "click", 9.0)) // newer version of key 1
    q.processAllAvailable()
    q.stop()
    val state = spark.read.parquet(out)
      .select("user_id", "value").as[(Long, Double)].collect().toMap
    assert(state == Map(1L -> 9.0, 2L -> 2.0))
  }

  test("streaming quarantine routes each micro-batch to good/bad sinks") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-squar").toString
    val (good, bad) = (base + "/good", base + "/bad")
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), "view", 10.0),      // clean
      Event(2, ts(1), "error", 10.0),     // unknown_type
      Event(3, ts(2), "purchase", 99.5))  // value_range
    val q = Streams.quarantineStream(input.toDF(), good, bad).start()
    q.processAllAvailable()
    input.addData(Event(4, ts(3), "click", 5.0)) // second batch, clean
    q.processAllAvailable()
    q.stop()
    val goodIds = spark.read.parquet(good).select("user_id").as[Long].collect().sorted
    assert(goodIds.sameElements(Array(1L, 4L)))
    val badRows = spark.read.parquet(bad)
      .select("user_id", "reasons").as[(Long, String)].collect().toMap
    assert(badRows == Map(2L -> "unknown_type", 3L -> "value_range"))
  }

  test("streaming dedup drops repeated keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), "click", 1.0),
      Event(1, ts(0), "click", 1.0), // duplicate key (user_id, ts)
      Event(2, ts(1), "view", 2.0))
    val q = Streams.dedupStream(input.toDF(), Seq("user_id", "ts"))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("deduped").count() == 2)
  }

  test("stateful sessionization closes a session after the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // session 1: 10:00-10:05; then a 40-min gap; session 2 at 10:45
    input.addData(
      Event(7, ts(0), "click", 1.0),
      Event(7, ts(5), "click", 2.0),
      Event(7, ts(45), "click", 4.0))
    q.processAllAvailable()
    // push the watermark forward so the open session can time out
    input.addData(Event(8, Timestamp.valueOf("2025-01-01 14:00:00"), "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessions").as[Session].collect().filter(_.user_id == 7)
    assert(sessions.length >= 1)
    val first = sessions.minBy(_.session_start.getTime)
    assert(first.n_events == 2 && first.total_value == 3.0)
    assert(first.session_start == ts(0) && first.session_end == ts(5))
  }

  test("streaming quality gate scores a doc stream with the batch rules") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val good = "the a of and in " + (1 to 45).map(i => s"token$i").mkString(" ")
    val bad = ("spam " * 40).trim
    input.addData((1L, good), (2L, bad))
    val q = Streams.qualityGateStream(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gated")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val keep = spark.table("gated").collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(keep(1L) && !keep(2L))
    // decisions match the batch operator bit-for-bit on the same docs
    import spark.implicits._
    val batch = graft.operators.TextAnalysis2.gopherColumns(
      Seq((1L, good), (2L, bad)).toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(batch == keep)
  }

  test("streaming decode runs the real WAV parser and agrees with the batch seam") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    val input = MemoryStream[(Long, Array[Byte])]
    val ids = Seq(3L, 17L, 64L)
    input.addData(ids.map(id => (id, Multimodal.synthWav(id))): _*)
    val q = Streams.decodeAudioStream(input.toDF().toDF("doc_id", "payload"))
      .writeStream.format("memory").queryName("decoded_audio")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("decoded_audio").collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(4), r.getDouble(6))).toMap
    assert(got.keySet == ids.toSet)
    ids.foreach { id =>
      // identical features to driving the decoder directly — live feed
      // and batch backfill share the codec
      val direct = Multimodal.wavDecoder(
        Multimodal.MediaRecord(id, Multimodal.synthWav(id)), 0L)
      val (rate, n, rms) = got(id)
      assert(rate == direct.sample_rate && n == direct.n_samples
        && rms == direct.rms, s"doc $id")
    }
  }

  test("near-dup gate drops same-signature docs in-stream, keeping the first arrival") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // two docs sharing all 3-grams (identical text) collapse to one
    // signature; a distinct doc survives; a tiny (<3 tokens) doc pair
    // dedups by exact text
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (1 to 30).map(i => s"u$i").mkString(" ")
    val input = MemoryStream[(Long, String, Timestamp)]
    input.addData(
      (1L, base, ts(0)), (2L, base, ts(1)),
      (3L, other, ts(2)),
      (4L, "hi there", ts(3)), (5L, "hi there", ts(4)))
    val q = Streams.nearDupGateStream(input.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("neardup").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 3L, 4L)), kept.mkString(","))
    // the stream's signature equals the batch SimHashSig on the same text
    val batchSig = Seq((1L, base)).toDF("doc_id", "text")
      .select(graft.functions.SimHashSig(
        array_distinct(graft.functions.WordNGrams(col("text"), 3))))
      .collect()(0).getLong(0)
    val streamSig = spark.table("neardup").collect()
      .find(_.getLong(0) == 1L).get.getAs[Long]("simhash")
    assert(streamSig == batchSig)
  }

  test("throttle stream caps each user at maxPerHour and resets on a new hour") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.throttleStream(input.toDS(), maxPerHour = 3)
      .writeStream.format("memory").queryName("throttled")
      .outputMode("append").start()
    // five events for user 1 in hour 10:xx -> only 3 pass; user 2 unaffected
    input.addData(
      Event(1, ts(1), "click", 1.0), Event(1, ts(2), "click", 2.0),
      Event(1, ts(3), "click", 3.0), Event(1, ts(4), "click", 4.0),
      Event(1, ts(5), "click", 5.0),
      Event(2, ts(6), "view", 1.0))
    q.processAllAvailable()
    // a new hour bucket re-admits user 1
    input.addData(Event(1, Timestamp.valueOf("2025-01-01 11:30:00"), "click", 9.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("throttled").collect()
    val u1Hour10 = rows.filter(r => r.getLong(0) == 1 && r.getTimestamp(1).before(
      Timestamp.valueOf("2025-01-01 11:00:00")))
    assert(u1Hour10.length == 3)
    // deterministic: the FIRST three by ts pass
    assert(u1Hour10.map(_.getDouble(3)).sorted.sameElements(Array(1.0, 2.0, 3.0)))
    assert(rows.count(r => r.getLong(0) == 2) == 1)
    assert(rows.exists(r => r.getLong(0) == 1 && r.getDouble(3) == 9.0))
  }

  test("rate-source event generator emits the kafka event shape and flows into the window agg") {
    val src = graft.sources.Sources.rateEvents(spark, rowsPerSecond = 500)
    assert(src.isStreaming)
    assert(src.columns.toSeq ==
      Seq("event_id", "ts", "customer_id", "product_id", "qty", "unit_price"))
    val q = src
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "5 seconds"), col("product_id"))
      .agg(count(lit(1)).as("n"), sum(col("qty") * col("unit_price")).as("revenue"))
      .writeStream.format("memory").queryName("rated")
      .outputMode("update").start()
    try {
      // wait for at least one non-empty micro-batch
      val deadline = System.currentTimeMillis() + 30000
      var rows = 0L
      while (rows == 0 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        rows = spark.table("rated").count()
      }
      assert(rows > 0, "no rate-source events arrived within 30s")
      val r = spark.table("rated").collect()
      assert(r.forall(x => x.getAs[Long]("n") > 0))
      assert(r.forall { x =>
        val p = x.getAs[Long]("product_id"); p >= 0 && p < 50
      })
    } finally q.stop()
  }

  test("sliding windows land each event in four overlapping hour windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(Event(1, ts(30), "click", 2.0))
    val q = Streams.slidingCounts(input.toDF())
      .writeStream.format("memory").queryName("slid")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("slid").collect()
    assert(rows.length == 4, s"expected 4 overlapping windows, got ${rows.length}")
    assert(rows.forall(r => r.getLong(2) == 1 && r.getDouble(3) == 2.0))
    val starts = rows.map(_.getTimestamp(0).toString).sorted
    assert(starts.head.contains("09:45") && starts.last.contains("10:30"))
  }

  test("scene cuts: planted frame change detected at the right offset") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scene").toString
    import spark.implicits._
    // 64 chars = 4 frames of 16; sampled every 1 -> frames 0..3. The
    // last 16 chars differ -> exactly one cut at frame_idx 3
    val same = "abcdefghijklmnop"
    val text = same * 3 + "XXXXXXXXXXXXXXXX"
    Seq((1L, text, "en", "s", text.length.toLong),
        (2L, same * 4, "en", "s", (same * 4).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.Multimodal.sceneCuts(Tables(spark, dir), 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))).toMap
    assert(rows(1L) == ((4L, 1L, 3)))
    assert(rows(2L) == ((4L, 0L, -1)))
  }

  test("throttle: a late prior-hour event neither resets nor bypasses the caps") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.throttleStream(input.toDS(), maxPerHour = 3)
      .writeStream.format("memory").queryName("throttled_late")
      .outputMode("append").start()
    // fill hour 10:00's budget
    input.addData(
      Event(1, ts(1), "click", 1.0), Event(1, ts(2), "click", 2.0),
      Event(1, ts(3), "click", 3.0))
    q.processAllAvailable()
    // a LATE event from hour 09:xx arrives: admitted against ITS hour...
    input.addData(Event(1, Timestamp.valueOf("2025-01-01 09:50:00"), "click", 8.0))
    q.processAllAvailable()
    // ...and hour 10:00 must still be full: these must all drop
    input.addData(
      Event(1, ts(20), "click", 4.0), Event(1, ts(21), "click", 5.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("throttled_late").collect()
    val hour10 = rows.filter(r => r.getLong(0) == 1 &&
      !r.getTimestamp(1).before(Timestamp.valueOf("2025-01-01 10:00:00")))
    assert(hour10.length == 3, s"hour 10 cap violated: ${hour10.length}")
    assert(hour10.map(_.getDouble(3)).sorted.sameElements(Array(1.0, 2.0, 3.0)))
    assert(rows.exists(_.getDouble(3) == 8.0), "late event should pass against its own hour")
  }

  test("anomaly gate: single-sample and zero-variance types flag only on deviation") {
    implicit val sqlCtx = spark.sqlContext
    val hist = Seq(
      Event(1, ts(0), "signup", 3.0),                      // n = 1
      Event(2, ts(1), "view", 2.0), Event(3, ts(2), "view", 2.0),
      Event(4, ts(3), "view", 2.0))                        // n = 3, variance 0
      .toDF()
    val stats = Streams.valueStats(hist)
    val input = MemoryStream[Event]
    val q = Streams.anomalyGateStream(input.toDF(), stats)
      .writeStream.format("memory").queryName("anomalies_degen")
      .outputMode("append").start()
    input.addData(
      Event(40, ts(10), "signup", 3.0),   // exact repeat of the one sample
      Event(41, ts(11), "signup", 9.0),   // deviates, no distribution to absolve it
      Event(42, ts(12), "view", 2.0),     // at the zero-variance mean
      Event(43, ts(13), "view", 2.5))     // off the zero-variance mean
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("anomalies_degen").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Boolean]("is_anomaly")).toMap
    assert(!rows(40L) && rows(41L) && !rows(42L) && rows(43L))
  }

  test("attribution stream credits purchases like the batch model on an in-order feed") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.{AttrEvent, AttributedPurchase}
    val input = MemoryStream[AttrEvent]
    val q = Streams.attributionStream(input.toDS())
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    input.addData(
      AttrEvent(1, ts(0), 100, "view", 0.0),
      AttrEvent(1, ts(1), 101, "purchase", 10.0),
      AttrEvent(1, ts(2), 102, "click", 0.0),
      AttrEvent(1, ts(3), 103, "purchase", 20.0),
      AttrEvent(2, ts(4), 200, "purchase", 5.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attributed").as[AttributedPurchase].collect()
      .map(p => p.event_id -> ((p.first_touch, p.last_touch, p.value))).toMap
    assert(rows(101L) == (("view", "view", 10.0)))
    assert(rows(103L) == (("view", "click", 20.0)))
    assert(rows(200L) == (("direct", "direct", 5.0)))
    assert(rows.size == 3)
  }

  test("attribution stream: a late touch never overwrites a newer last_touch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.{AttrEvent, AttributedPurchase}
    val input = MemoryStream[AttrEvent]
    val q = Streams.attributionStream(input.toDS())
      .writeStream.format("memory").queryName("attributed_late")
      .outputMode("append").start()
    input.addData(AttrEvent(3, ts(30), 300, "click", 0.0))
    q.processAllAvailable()
    // view arrives LATE (event time before the click already in state)
    input.addData(AttrEvent(3, ts(5), 301, "view", 0.0))
    q.processAllAvailable()
    input.addData(AttrEvent(3, ts(40), 302, "purchase", 7.0))
    q.processAllAvailable()
    q.stop()
    val p = spark.table("attributed_late").as[AttributedPurchase].collect()
      .find(_.event_id == 302L).get
    // guard: last_touch keeps the newer click; first_touch is
    // first-write-wins (the documented at-most-watermark-late model)
    assert(p.last_touch == "click" && p.first_touch == "click")
  }

  test("native session windows: stream emits the batch session rows once closed") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, session_window}
    val input = MemoryStream[Event]
    val q = Streams.sessionWindowStream(input.toDF())
      .writeStream.format("memory").queryName("sessions_native")
      .outputMode("append").start()
    // two sessions for user 1 (gap > 30 min splits), one for user 2
    val evs = Seq(
      Event(1, ts(0), "click", 10.0), Event(1, ts(10), "view", 5.0),
      Event(1, ts(100), "click", 2.5),   // 90 min later → new session
      Event(2, ts(5), "view", 7.0))
    input.addData(evs: _*)
    q.processAllAvailable()
    // advance the watermark far past every session's close
    input.addData(Event(9, Timestamp.valueOf("2025-01-02 10:00:00"), "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_native").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3),
        r.getDouble(4))).toSet
    // the batch twin over the same rows (shared projection shape)
    import spark.implicits._
    val batch = evs.toDF()
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum(col("value").cast("decimal(12,2)"))
          .cast("double").as("total_value"))
      .select(col("user_id"), col("w.start"), col("n_events"), col("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got.size == 3, "expected exactly three closed sessions")
  }

  test("trending top-k over streaming counts equals the batch replay") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("trending").toString
    val input = MemoryStream[Event]
    val q = Streams.trendingCountsStream(input.toDF(), s"$dir/state")
      .option("checkpointLocation", s"$dir/ckpt").start()
    input.addData(
      Event(1, ts(0), "click", 1.0), Event(2, ts(1), "click", 1.0),
      Event(3, ts(2), "view", 1.0), Event(4, ts(3), "view", 1.0),
      Event(5, ts(4), "view", 1.0), Event(6, ts(5), "purchase", 1.0),
      Event(7, ts(65), "click", 1.0), Event(8, ts(66), "error", 1.0))
    q.processAllAvailable()
    // a second trigger UPDATES hour 10's counts (cumulative totals) and
    // adds to hour 11 — latest-wins read must see the new totals
    input.addData(
      Event(9, ts(6), "click", 1.0), Event(10, ts(7), "click", 1.0),
      Event(11, ts(67), "error", 1.0))
    q.processAllAvailable()
    q.stop()
    val got = Streams.trendingTopK(spark, s"$dir/state", 2).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    // batch replay: count per (hour, type), top-2 by (n desc, type asc)
    val all = Seq(
      (ts(0), "click"), (ts(1), "click"), (ts(2), "view"), (ts(3), "view"),
      (ts(4), "view"), (ts(5), "purchase"), (ts(65), "click"),
      (ts(66), "error"), (ts(6), "click"), (ts(7), "click"),
      (ts(67), "error"))
    val hourMs = 3600L * 1000L
    val counts = all.groupBy { case (t, ty) =>
      (new Timestamp(t.getTime / hourMs * hourMs), ty)
    }.view.mapValues(_.size.toLong).toSeq
      .map { case ((h, ty), n) => (h.toString, ty, n) }
    val expected = counts.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(2)
    }.sortBy(r => (r._1, -r._3, r._2))
    assert(got.toSeq == expected,
      s"got ${got.toSeq} expected $expected")
  }

  test("cdc materialization applies LSN-ordered upserts, deletes, and late changes") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.{CdcOp, CdcRow}
    val input = MemoryStream[CdcOp]
    val q = Streams.cdcMaterialize(input.toDS())
      .writeStream.format("memory").queryName("cdc_view")
      .outputMode("update").start()
    // batch 1: inserts + an update
    input.addData(
      CdcOp(1, ts(0), 1, "I", 10.0), CdcOp(1, ts(1), 2, "U", 20.0),
      CdcOp(2, ts(0), 3, "I", 5.0),
      CdcOp(3, ts(5), 9, "U", 50.0))   // key 3's update arrives FIRST
    q.processAllAvailable()
    // batch 2: key 2 deleted; key 3's original insert arrives LATE (older
    // ts) and must NOT regress the materialized value
    input.addData(
      CdcOp(2, ts(2), 4, "D", 0.0),
      CdcOp(3, ts(2), 5, "I", 30.0))
    q.processAllAvailable()
    // batch 3: key 2 resurrected by a NEWER insert after its tombstone
    input.addData(CdcOp(2, ts(6), 10, "I", 7.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cdc_view").as[CdcRow].collect()
    val current = rows.groupBy(_.key).view
      .mapValues(_.maxBy(r => (r.ts.getTime, r.lsn))).toMap
    assert(current(1L).value == 20.0 && !current(1L).is_deleted)
    assert(current(2L).value == 7.0 && !current(2L).is_deleted,
      "newer insert must resurrect the deleted key")
    assert(current(3L).value == 50.0 && current(3L).lsn == 9,
      "late stale change must not regress the view")
    // the delete DID surface as a tombstone before the resurrect
    assert(rows.exists(r => r.key == 2L && r.is_deleted),
      "deletes must materialize as tombstone rows, not vanish")
    // every key's final state equals the batch replay (argmax by ts, lsn)
    val all = Seq(
      (1L, 0L, 1L, "I", 10.0), (1L, 1L, 2L, "U", 20.0),
      (2L, 0L, 3L, "I", 5.0), (2L, 2L, 4L, "D", 0.0),
      (2L, 6L, 10L, "I", 7.0),
      (3L, 5L, 9L, "U", 50.0), (3L, 2L, 5L, "I", 30.0))
    val replay = all.groupBy(_._1).view.mapValues { ops =>
      val w = ops.maxBy(o => (ts(o._2.toInt).getTime, o._3))
      (if (w._4 == "D") 0.0 else w._5, w._4 == "D")
    }.toMap
    replay.foreach { case (k, (v, del)) =>
      assert(current(k).value == v && current(k).is_deleted == del,
        s"stream/batch divergence for key $k")
    }
  }

  test("anomaly gate stream scores a live feed against the batch-trained stats") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // batch-train the model on historical events, then score a stream
    val hist = Seq(
      Event(1, ts(0), "click", 10.0), Event(2, ts(1), "click", 11.0),
      Event(3, ts(2), "click", 9.0), Event(4, ts(3), "click", 10.5),
      Event(5, ts(4), "click", 9.5), Event(6, ts(5), "click", 10.2),
      Event(7, ts(6), "view", 1.0), Event(8, ts(7), "view", 1.2),
      Event(9, ts(8), "view", 0.8), Event(10, ts(9), "view", 1.1))
      .toDF()
    val stats = Streams.valueStats(hist)
    val q = Streams.anomalyGateStream(input.toDF(), stats)
      .writeStream.format("memory").queryName("anomalies")
      .outputMode("append").start()
    input.addData(
      Event(20, ts(10), "click", 10.1),  // in-distribution
      Event(21, ts(11), "click", 99.0),  // obvious outlier
      Event(22, ts(12), "view", 1.05))   // in-distribution
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("anomalies").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Double]("z"), r.getAs[Boolean]("is_anomaly")))).toMap
    assert(!rows(20L)._2 && !rows(22L)._2 && rows(21L)._2)
    // unseen event type must SURFACE as an anomaly, not vanish (left join)
    val input2 = MemoryStream[Event]
    val q2 = Streams.anomalyGateStream(input2.toDF(), stats)
      .writeStream.format("memory").queryName("anomalies2")
      .outputMode("append").start()
    input2.addData(
      Event(30, ts(13), "refund", 5.0),    // type absent from the model
      Event(31, ts(14), "error", 7.0),     // also absent
      Event(32, ts(15), "click", 10.0))
    q2.processAllAvailable()
    q2.stop()
    val rows2 = spark.table("anomalies2").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Boolean]("is_anomaly")).toMap
    assert(rows2.size == 3, "unseen types must pass through the gate")
    assert(rows2(30L) && rows2(31L) && !rows2(32L))
    // the z-score matches the batch formula on the same model
    val s = stats.where(col("event_type") === "click").collect()(0)
    val (n, sx, sx2) = (s.getLong(1), s.getDouble(2), s.getDouble(3))
    val expectZ = (99.0 - sx / n) / math.sqrt((sx2 - sx * sx / n) / (n - 1))
    assert(rows(21L)._1 == expectZ)
  }

  test("ANN gate: streamed vectors score bit-equal to the batch ADC scorer") {
    implicit val sqlCtx = spark.sqlContext
    // train the IVF-PQ gate model offline on the sf corpus
    val model = graft.operators.Similarity.annGateModel(sf)
    // stream the corpus's own vectors through the live gate
    val corpus = sf.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => VecEvent(r.getLong(0), r.getSeq[Double](1)))
    val input = MemoryStream[VecEvent]
    val q = Streams.annGateStream(
        input.toDF().withColumnRenamed("v", "embedding"), model, 0.5)
      .writeStream.format("memory").queryName("ann_gate")
      .outputMode("append").start()
    input.addData(corpus.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ann_gate").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("adc_dist"), r.getAs[Boolean]("is_near")))).toMap
    assert(streamed.size == corpus.length)
    // the batch ADC scorer's top-10 distances must appear bit-equal
    val batch = graft.operators.Embeddings.pqAdcTopK(sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(batch.nonEmpty)
    batch.foreach { case (id, d) =>
      assert(streamed(id)._1 == d, s"vec $id: stream ${streamed(id)._1} != batch $d")
      assert(streamed(id)._2 == (d < 0.5))
    }
  }

  test("streaming packer carries per-source token tapes across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.{PackDoc, PackedDoc}
    val input = MemoryStream[PackDoc]
    val q = Streams.packStream(input.toDS(), capacity = 100L)
      .writeStream.format("memory").queryName("packed")
      .outputMode("append").start()
    // batch 1: two sources; within-batch order is doc_id order
    input.addData(
      PackDoc("web", 2L, 60L), PackDoc("web", 1L, 70L),
      PackDoc("code", 5L, 250L))
    q.processAllAvailable()
    // batch 2: tapes continue where batch 1 left them
    input.addData(PackDoc("web", 3L, 40L), PackDoc("code", 6L, 10L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("packed").as[PackedDoc].collect()
      .map(p => (p.source, p.doc_id) -> ((p.start_offset, p.bin))).toMap
    // web tape: doc1 @0 (bin 0), doc2 @70 (bin 0), then doc3 @130 (bin 1)
    assert(got(("web", 1L)) == ((0L, 0L)))
    assert(got(("web", 2L)) == ((70L, 0L)))
    assert(got(("web", 3L)) == ((130L, 1L)))
    // code tape independent: doc5 @0 (bin 0), doc6 @250 (bin 2)
    assert(got(("code", 5L)) == ((0L, 0L)))
    assert(got(("code", 6L)) == ((250L, 2L)))
  }

  test("decontamination gate flags stream docs sharing 5-grams with the bench set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val leaky = "prefix words then alpha beta gamma delta epsilon more tail"
    val clean = "completely unrelated content about spark shuffles and joins here"
    val short = "too few words" // < 5 tokens: no grams, must keep
    val input = MemoryStream[(Long, String)]
    input.addData((1L, leaky), (2L, clean), (3L, short))
    val q = Streams.decontamGateStream(input.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("decontam").collect()
      .map(r => r.getLong(0) -> ((r.getAs[Int]("n_bench_grams"), r.getAs[Boolean]("keep"))))
      .toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L)._1 > 0 && !rows(1L)._2, s"leaky doc must be flagged: $rows")
    assert(rows(2L) == ((0, true)))
    assert(rows(3L) == ((0, true)))
    // the stream's overlap count equals the shared 5-gram recipe by hand
    val w = leaky.split(" ")
    val leakyGrams = (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toSet
    val bw = benchText.split(" ")
    val benchGrams = (0 to bw.length - 5).map(i => bw.slice(i, i + 5).mkString(" ")).toSet
    assert(rows(1L)._1 == leakyGrams.count(benchGrams))
  }

  test("drift gate flags a shifted category mix and passes a matching one") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    val baseline = Map("click" -> 0.5, "view" -> 0.5)
    val input = MemoryStream[Event]
    // batch 0: matches the baseline mix exactly
    input.addData((1 to 10).map(i =>
      Event(i.toLong, ts(i), if (i % 2 == 0) "click" else "view", 1.0)): _*)
    val q = Streams.driftGateStream(input.toDF(), baseline, dir)
      .option("checkpointLocation", s"$dir-ckpt").start()
    q.processAllAvailable()
    // batch 1: all clicks (shifted), plus an unseen type
    input.addData((11 to 20).map(i => Event(i.toLong, ts(i), "click", 1.0)) :+
      Event(21L, ts(21), "purchase", 1.0): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Int]("batch_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_unseen_types"),
          r.getAs[Double]("chi2"), r.getAs[Boolean]("drifted"))))
      .toMap
    assert(rows.size == 2)
    val (n0, u0, chi0, d0) = rows(0)
    assert(n0 == 10L && u0 == 0L && chi0 == 0.0 && !d0)
    val (n1, u1, chi1, d1) = rows(1)
    assert(n1 == 11L && u1 == 1L && d1)
    // chi2 replay over the type-sorted baseline: click (o=10) then
    // view (o=0), each against e = 0.5 * 11
    val e = 0.5 * 11
    val expChi = (10.0 - e) * (10.0 - e) / e + (0.0 - e) * (0.0 - e) / e
    assert(chi1 == expChi, s"chi2 $chi1 vs $expChi")
  }

  test("late-data tap routes watermark-late rows to the dead letter and counts them") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("latetap").toString
    val input = MemoryStream[Event]
    // batch 0: no watermark yet — everything kept, monitor says wm = -1
    input.addData(Event(1, ts(0), "a", 1.0), Event(2, ts(30), "b", 1.0))
    val q = Streams.lateDataTapStream(input.toDF(), dir)
      .option("checkpointLocation", s"$dir-ckpt").start()
    q.processAllAvailable()
    // batch 1: watermark = 10:30 − 10min = 10:20. The 10:05 event is
    // LATE (would be silently dropped by a stateful agg); 10:25 and
    // 10:45 are on time
    input.addData(Event(3, ts(5), "late", 1.0), Event(4, ts(25), "c", 1.0),
      Event(5, ts(45), "d", 1.0))
    q.processAllAvailable()
    // batch 2: watermark advances to 10:45 − 10min = 10:35; 10:33 late
    input.addData(Event(6, ts(33), "late2", 1.0), Event(7, ts(50), "e", 1.0))
    q.processAllAvailable()
    q.stop()
    val monitor = spark.read.parquet(s"$dir/monitor").collect()
      .map(r => r.getAs[Int]("batch_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_late"),
          r.getAs[Long]("watermark_ms")))).toMap
    assert(monitor(0) == ((2L, 0L, -1L)), s"batch 0: $monitor")
    val wm1 = ts(20).getTime
    assert(monitor(1) == ((3L, 1L, wm1)), s"batch 1: $monitor")
    val wm2 = ts(35).getTime
    assert(monitor(2) == ((2L, 1L, wm2)), s"batch 2: $monitor")
    // dead letter holds exactly the two late events
    val late = spark.read.parquet(s"$dir/late").collect()
      .map(_.getAs[Long]("user_id")).sorted.toSeq
    assert(late == Seq(3L, 6L), s"late: $late")
    // nothing vanished: kept + late partition the input
    val kept = spark.read.parquet(s"$dir/kept").collect()
      .map(_.getAs[Long]("user_id")).sorted.toSeq
    assert(kept == Seq(1L, 2L, 4L, 5L, 7L), s"kept: $kept")
  }

  test("srm gate: cumulative arm tallies match the batch hash replay, chi2 exact") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("srmgate").toString
    val input = MemoryStream[Event]
    val b0 = (1 to 20).map(i => Event(i.toLong, ts(1), "click", 1.0)) ++
      (1 to 8).map(i => Event(i.toLong, ts(2), "view", 1.0))
    input.addData(b0: _*)
    val q = Streams.srmGateStream(input.toDF(), dir)
      .option("checkpointLocation", s"$dir-ckpt").start()
    q.processAllAvailable()
    // batch 1: repeat exposures for some users — the stream tallies
    // EVENTS, so these add again; plus fresh users on view
    val b1 = (1 to 5).map(i => Event(i.toLong, ts(3), "click", 1.0)) ++
      (9 to 14).map(i => Event(i.toLong, ts(4), "view", 1.0))
    input.addData(b1: _*)
    q.processAllAvailable()
    q.stop()
    // replay the arm assignment with the library's own portable hash
    def arms(evs: Seq[Event]): Map[(String, Long), Long] =
      evs.map(e => (e.event_type, e.user_id)).toDF("experiment", "user_id")
        .withColumn("arm", org.apache.spark.sql.functions.pmod(
          graft.functions.PortableHash.hash60(
            org.apache.spark.sql.functions.concat(
              col("user_id").cast("string"), lit(":"), col("experiment"))),
          lit(2L)))
        .groupBy("experiment", "arm").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap.withDefaultValue(0L)
    val a0 = arms(b0)
    val aAll = arms(b0 ++ b1)
    val rows = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Int]("batch_id"), r.getAs[String]("experiment")) ->
        ((r.getAs[Long]("arm_a"), r.getAs[Long]("arm_b"),
          r.getAs[Long]("chi2_micros"), r.getAs[Boolean]("srm"))))
      .toMap
    assert(rows.size == 4, s"2 batches x 2 experiments: $rows")
    Seq("click", "view").foreach { exp =>
      val (a, b, chi2, flag) = rows((0, exp))
      assert(a == a0((exp, 0L)) && b == a0((exp, 1L)), s"batch0 $exp")
      assert(chi2 == (a - b) * (a - b) * 1000000L / (a + b))
      assert(flag == chi2 > 3841459L)
      // batch 1 rows carry the CUMULATIVE tally
      val (ca, cb, cchi2, cflag) = rows((1, exp))
      assert(ca == aAll((exp, 0L)) && cb == aAll((exp, 1L)), s"batch1 $exp")
      assert(cchi2 == (ca - cb) * (ca - cb) * 1000000L / (ca + cb))
      assert(cflag == cchi2 > 3841459L)
    }
  }

  test("container gate: real blobs keep, truncated and alien blobs flag") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BlobEvent]
    val png = graft.operators.Multimodal.synthPng(3L)
    val wav = graft.operators.Multimodal.synthWav(4L)
    val gif = graft.operators.Multimodal.synthGif(5L)
    // corruption classes: truncated PNG (IEND gone), WAV whose RIFF size
    // field lies (one byte chopped), and an alien blob
    val cutPng = png.take(png.length - 10)
    val lyingWav = wav.take(wav.length - 1)
    val alien = "not a container at all".getBytes("UTF-8")
    input.addData(
      BlobEvent(1, ts(1), png), BlobEvent(2, ts(1), wav),
      BlobEvent(3, ts(2), gif), BlobEvent(4, ts(2), cutPng),
      BlobEvent(5, ts(3), lyingWav), BlobEvent(6, ts(3), alien))
    val q = Streams.containerGateStream(input.toDF())
      .writeStream.format("memory").queryName("containergate")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("containergate").collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(rows(1L) == (("png", true, true, true)))
    assert(rows(2L) == (("wav", true, true, true)))
    assert(rows(3L) == (("gif", true, true, true)))
    // magic still reads, the structural walk catches the damage
    assert(rows(4L) == (("png", true, false, false)))
    assert(rows(5L) == (("wav", true, false, false)))
    assert(rows(6L) == (("unknown", false, false, false)))
  }

  test("lsh dedup gate: stream keeps equal the batch incremental-dedup keeps") {
    implicit val sqlCtx = spark.sqlContext
    // the daily batch (doc_id % 5 = 0) arrives as a stream and probes the
    // standing corpus index — the exact incrementalDedup split, so the
    // batch operator's own pair output derives the expected verdicts
    val t = sf
    val index = graft.operators.Dedup.corpusBandIndex(t)
    val batchDocs = t.documents.where(org.apache.spark.sql.functions.expr("doc_id % 5 = 0"))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val input = MemoryStream[DocEvent]
    input.addData(batchDocs.map { case (id, tx) => DocEvent(id, ts(5), tx) }.toSeq: _*)
    // sentinel far past the window: closes the 10:00 pane under append mode
    input.addData(DocEvent(999999L, Timestamp.valueOf("2025-01-02 10:00:00"), ""))
    val q = Streams.lshDedupGateStream(input.toDF(), index)
      .writeStream.format("memory").queryName("lshgate")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(DocEvent(999998L, Timestamp.valueOf("2025-01-03 10:00:00"), ""))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("lshgate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .filter(_._1 < 999000L)
    assert(rows.map(_._1).sorted.toSeq == batchDocs.map(_._1).toSeq,
      "every batch doc gets exactly one verdict")
    // expected from the BATCH operator's pairs: a batch doc is a dup iff
    // it pairs with a corpus doc (either side) or with a LOWER-id batch
    // doc (it is the later element of a canonical (min, max) pair)
    val pairs = graft.operators.Dedup.incrementalDedup(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expectDup = batchDocs.map(_._1).map { d =>
      d -> pairs.exists { case (a, b) =>
        (a == d && b % 5 != 0) || (b == d && a % 5 != 0) || (b == d && a % 5 == 0)
      }
    }.toMap
    rows.foreach { case (d, nc, ns, keep) =>
      assert(keep == !expectDup(d), s"doc $d: keep=$keep dups=($nc,$ns)")
      assert(keep == (nc == 0 && ns == 0))
    }
    // the gate must actually separate at this SF
    assert(rows.exists(_._4) && rows.exists(!_._4),
      s"need both outcomes, got ${rows.toSeq}")
  }

  test("lsh dedup gate: out-of-order arrival still collides (lower id arrives later)") {
    implicit val sqlCtx = spark.sqlContext
    // the duplicate verdict belongs to the HIGHER doc_id regardless of
    // which member arrives first — a one-sided a_ts <= b_ts join bound
    // would silently admit both docs whenever the lower-id member shows
    // up later within the window (round-12 advice finding)
    val t = sf
    val index = graft.operators.Dedup.corpusBandIndex(t).where(lit(false))
    val dupText = "the quick brown fox jumps over the lazy dog near the old stone bridge at dawn"
    val soloText = "completely unrelated content about maritime navigation charts and tidal tables"
    val input = MemoryStream[DocEvent]
    // higher id 7 arrives FIRST (earlier event time AND earlier batch)
    input.addData(DocEvent(7L, ts(5), dupText), DocEvent(9L, ts(6), soloText))
    val q = Streams.lshDedupGateStream(input.toDF(), index)
      .writeStream.format("memory").queryName("lshgate_ooo")
      .outputMode("append").start()
    q.processAllAvailable()
    // lower id 3 arrives LATER, still inside the 1h window and 2h bound
    input.addData(DocEvent(3L, ts(45), dupText))
    q.processAllAvailable()
    input.addData(DocEvent(999999L, Timestamp.valueOf("2025-01-02 10:00:00"), ""))
    q.processAllAvailable()
    input.addData(DocEvent(999998L, Timestamp.valueOf("2025-01-03 10:00:00"), ""))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("lshgate_ooo").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .filter(_._1 < 999000L).toMap
    assert(rows.keySet == Set(3L, 7L, 9L), s"verdicts: $rows")
    // doc 3 (lowest id of the pair) is the keeper; doc 7 is the dup even
    // though it arrived first
    assert(rows(3L) == ((0L, 0L, true)), s"doc 3: ${rows(3L)}")
    val (nc7, ns7, keep7) = rows(7L)
    assert(nc7 == 0L && ns7 >= 1L && !keep7, s"doc 7: ${rows(7L)}")
    assert(rows(9L) == ((0L, 0L, true)), s"doc 9: ${rows(9L)}")
  }

  test("perplexity gate stream scores equal the batch gate on the same docs") {
    implicit val sqlCtx = spark.sqlContext
    val t = sf
    val (uni, bc, thr) = graft.operators.Curation.pplModel(t)
    val scoredDocs = t.documents
      .where(org.apache.spark.sql.functions.expr("doc_id % 7 <> 0"))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[DocEvent]
    input.addData(scoredDocs.map { case (id, tx) => DocEvent(id, ts(5), tx) }.toSeq: _*)
    input.addData(DocEvent(999999L, Timestamp.valueOf("2025-01-02 10:00:00"), "a b"))
    val q = Streams.perplexityGateStream(input.toDF(), uni, bc, thr)
      .writeStream.format("memory").queryName("pplgate")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(DocEvent(999998L, Timestamp.valueOf("2025-01-03 10:00:00"), "a b"))
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("pplgate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .filter(_._1 < 999000L).sortBy(_._1)
    val batch = graft.operators.Curation.perplexityGate(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(stream.length == batch.length)
    stream.zip(batch).foreach { case (sv, bv) => assert(sv == bv, s"$sv vs $bv") }
    assert(stream.exists(_._4) && stream.exists(!_._4))
  }

  test("foreachBatch monitors: replaying batch 0 with the same batchId is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    // the restart contract the batch-id-partitioned overwrites exist
    // for, made load-bearing: run batch 0, delete its COMMIT marker
    // (the crash window between the sink writes and the commit-log
    // write), restart from the same checkpoint with a fresh source
    // holding the same data — Spark re-executes batch 0 with the SAME
    // batchId, and every monitor/sink table must come out unchanged
    // (an append-mode sink would double its rows here)
    def replayed(name: String,
        mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
        data: Seq[Event], tables: Seq[String]): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"replay-$name")
        .toString + "/ckpt"
      def runOnce(): Unit = {
        val input = MemoryStream[Event]
        input.addData(data: _*)
        val q = mk(input.toDF()).option("checkpointLocation", ckpt).start()
        q.processAllAvailable(); q.stop(); q.awaitTermination()
      }
      def snapshot(): Seq[Seq[String]] = tables.map { t =>
        spark.read.parquet(t).collect().map(_.toString).sorted.toSeq
      }
      runOnce()
      val before = snapshot()
      assert(before.exists(_.nonEmpty), s"$name wrote nothing")
      assert(new java.io.File(s"$ckpt/commits/0").delete(),
        s"$name: no commit marker to drop")
      // the local-FS checksum sidecar must go with it, or the replay's
      // commit rename trips FileAlreadyExistsException
      new java.io.File(s"$ckpt/commits/.0.crc").delete()
      runOnce()
      assert(snapshot() == before, s"$name: replay changed a table")
    }

    val dq = java.nio.file.Files.createTempDirectory("replay-out-q").toString
    replayed("quarantine",
      df => Streams.quarantineStream(df, s"$dq/good", s"$dq/bad"),
      Seq(Event(1, ts(0), "view", 10.0), Event(2, ts(1), "error", 10.0),
        Event(3, ts(2), "purchase", 99.5)),
      Seq(s"$dq/good", s"$dq/bad"))

    val dd = java.nio.file.Files.createTempDirectory("replay-out-d").toString
    replayed("drift",
      df => Streams.driftGateStream(df,
        Map("view" -> 0.5, "click" -> 0.5), s"$dd/drift"),
      Seq(Event(1, ts(0), "view", 1.0), Event(2, ts(1), "click", 2.0),
        Event(3, ts(2), "error", 3.0)),
      Seq(s"$dd/drift"))

    val ds = java.nio.file.Files.createTempDirectory("replay-out-s").toString
    replayed("srm",
      df => Streams.srmGateStream(df, s"$ds/srm"),
      (1 to 12).map(i => Event(i.toLong, ts(1), "click", 1.0)) ++
        (1 to 6).map(i => Event(i.toLong, ts(2), "view", 1.0)),
      Seq(s"$ds/srm"))

    val dl = java.nio.file.Files.createTempDirectory("replay-out-l").toString
    replayed("latetap",
      df => Streams.lateDataTapStream(df, s"$dl/tap"),
      Seq(Event(1, ts(0), "a", 1.0), Event(2, ts(30), "b", 1.0)),
      Seq(s"$dl/tap/kept", s"$dl/tap/monitor"))
  }

  test("streaming manifest maintenance: growing table stays prunable with exact results") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-mstream").toString + "/t"
    val input = MemoryStream[Event]
    val q = Streams.manifestAppendStream(
        input.toDF(), Seq("value"), dir, maxRecordsPerFile = 3)
      .option("checkpointLocation", s"$dir-ckpt").start()
    // two value-clustered batches (the event-time-stream shape that
    // makes zones tight): 1..8 then 100..108
    input.addData((1 to 8).map(i => Event(i.toLong, ts(i), "a", i.toDouble)): _*)
    q.processAllAvailable()
    input.addData((100 to 108).map(i => Event(i.toLong, ts(i), "b", i.toDouble)): _*)
    q.processAllAvailable()
    q.stop()
    val full = spark.read.option("recursiveFileLookup", "true").parquet(dir)
    assert(full.count() == 17)
    // one zone row per data file, carrying that file's exact min/max
    val mf = spark.read.option("recursiveFileLookup", "true").json(s"$dir/_manifest")
    assert(mf.select("file").as[String].collect().toSet == full.inputFiles.toSet)
    // a range inside batch 2: exact rows AND only batch-2 files touched
    val pruned = graft.sources.Sinks.readPruned(
      spark, dir, "value", lit(100.0), lit(104.0))
    assert(pruned.select("user_id").as[Long].collect().sorted.toSeq ==
      (100L to 104L))
    assert(pruned.inputFiles.nonEmpty &&
      pruned.inputFiles.forall(_.contains("/b1/")),
      s"expected only batch-1-dir files, got ${pruned.inputFiles.toSeq}")
    assert(pruned.inputFiles.length < full.inputFiles.length)
    // the batch-layout reader path still serves the whole growing table
    val all = graft.sources.Sinks.readPruned(
      spark, dir, "value", lit(0.0), lit(1000.0))
    assert(all.count() == 17)
    // an empty range prunes everything and still returns cleanly
    assert(graft.sources.Sinks.readPruned(
      spark, dir, "value", lit(-10.0), lit(-1.0)).count() == 0)
  }
}

/** Embedding arrival for the streaming ANN gate spec. */
final case class VecEvent(vec_id: Long, v: Seq[Double])

/** Document arrival for the streaming LSH dedup gate spec. */
final case class DocEvent(doc_id: Long, ts: Timestamp, text: String)

final case class BlobEvent(doc_id: Long, ts: Timestamp, payload: Array[Byte])