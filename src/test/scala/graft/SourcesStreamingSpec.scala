package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Multimodal
import graft.sources.JsonSource
import graft.streaming.Streams

class SourcesStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("JsonSource reads nested docs and flattens with P1 defaults") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "part-0.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"track_id":"t1","played_at":"2024-01-01T08:00:00Z","track_info":{"name":"Song","artists":[{"id":"a1","name":"Artist"}],"album":{"id":"al1","name":"Album"},"duration_ms":180000,"explicit":false,"popularity":55},"batch_info":{"batch_id":"b1","collected_at":"2024-01-01T09:00:00Z"}}""")
    w.println("""{"track_id":"t2","played_at":"2024-01-01T10:00:00Z","track_info":{"name":"NoArtists","artists":[],"album":{},"duration_ms":1000}}""")
    w.close()
    val flat = JsonSource.flatten(
      JsonSource.readListening(spark, dir.getAbsolutePath))
      .orderBy($"track_id").collect()
    assert(flat.length == 2)
    assert(flat(0).getAs[String]("artist_name") == "Artist")
    assert(flat(1).getAs[String]("artist_name") == "Unknown Artist")
    assert(flat(1).getAs[String]("album_name") == "Unknown Album")
    assert(flat(1).getAs[Boolean]("explicit") == false)
    assert(flat(1).getAs[Int]("popularity") == 0)
  }

  test("audited read quarantines malformed docs instead of nulling them") {
    val dir = Files.createTempDirectory("graft_json_bad").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "drop.json"))
    w.println("""{"track_id":"t1","played_at":"2024-01-01T08:00:00Z"}""")
    w.println("""{"track_id": BROKEN [not json""")
    w.println("""{"track_id":"t2","played_at":"2024-01-01T09:00:00Z"}""")
    w.close()
    val (good, bad) = JsonSource.quarantine(
      JsonSource.readListeningAudited(spark, dir.getAbsolutePath))
    assert(good.count() == 2)
    assert(!good.columns.contains("_corrupt_record"))
    val rejects = bad.collect()
    assert(rejects.length == 1)
    // the raw line is preserved verbatim for triage
    assert(rejects(0).getAs[String]("_corrupt_record")
      .contains("BROKEN"))
  }

  test("streaming dedup drops duplicate (user_id, ts) events") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = Streams.dedup(df).writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), "play", 1.0),
      (1L, ts("2024-01-01 10:00:00"), "play", 1.0), // dup
      (2L, ts("2024-01-01 10:05:00"), "play", 2.0))
    q.processAllAvailable()
    assert(spark.table("dedup_out").count() == 2)
    q.stop()
  }

  test("watermark-bounded dedup drops same-batch and cross-batch dups") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val df = mem.toDF()
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val q = Streams.dedupWithinWatermark(df).writeStream
      .format("memory").queryName("dedup_wm_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      (1L, 1L, ts("2024-01-01 10:00:00"), "play", 1.0),
      (1L, 1L, ts("2024-01-01 10:00:00"), "play", 1.0), // same-batch dup
      (2L, 1L, ts("2024-01-01 10:10:00"), "play", 2.0))
    q.processAllAvailable()
    mem.addData(
      // an at-least-once redelivery in the NEXT micro-batch, still
      // inside the watermark window (the designed use case)
      (1L, 1L, ts("2024-01-01 10:20:00"), "play", 1.0),
      (3L, 2L, ts("2024-01-01 10:30:00"), "play", 3.0))
    q.processAllAvailable()
    val got = spark.table("dedup_wm_out")
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
    q.stop()
  }

  test("streaming hourly counts aggregate with watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = Streams.hourlyCounts(df).writeStream
      .format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      (1L, ts("2024-01-01 10:05:00"), "play", 1.0),
      (2L, ts("2024-01-01 10:55:00"), "play", 2.0),
      (3L, ts("2024-01-01 11:05:00"), "skip", 3.0))
    q.processAllAvailable()
    // advance the watermark far enough to close the 10:00 + 11:00 windows
    mem.addData((4L, ts("2024-01-01 14:00:00"), "play", 4.0))
    q.processAllAvailable()
    val out = spark.table("hourly_out")
    val h10 = out.where($"hour_start" === ts("2024-01-01 10:00:00") &&
      $"event_type" === "play").collect()
    assert(h10.length == 1 && h10(0).getAs[Long]("n_events") == 2L)
    q.stop()
  }

  test("sessionize closes sessions on the gap boundary") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Streams.Ev]
    val q = Streams.sessionize(mem.toDS(), gapMinutes = 30).writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      Streams.Ev(1L, ts("2024-01-01 10:00:00"), "play", 1.0),
      Streams.Ev(1L, ts("2024-01-01 10:10:00"), "play", 1.0),
      // same batch, gap > 30 min -> closes the first session in-batch
      Streams.Ev(1L, ts("2024-01-01 11:30:00"), "play", 1.0))
    q.processAllAvailable()
    val out = spark.table("sessions_out").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Int]("n_events") == 2)
    assert(out(0).getAs[java.sql.Timestamp]("session_end") ==
      ts("2024-01-01 10:10:00"))
    q.stop()
  }

  test("sessionize extends the session start for late in-gap events") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Streams.Ev]
    val q = Streams.sessionize(mem.toDS(), gapMinutes = 30).writeStream
      .format("memory").queryName("late_sessions")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    mem.addData(Streams.Ev(1L, ts("2024-01-01 10:10:00"), "play", 1.0))
    q.processAllAvailable()
    // late event 15 min BEFORE the session start, still above the
    // watermark (10:10 - 1h) — must extend the start, not be dropped
    mem.addData(Streams.Ev(1L, ts("2024-01-01 09:55:00"), "play", 1.0))
    q.processAllAvailable()
    // push the watermark far forward to close the session
    mem.addData(Streams.Ev(9L, ts("2024-01-01 14:00:00"), "play", 1.0))
    q.processAllAvailable()
    val out = spark.table("late_sessions")
      .where($"user_id" === 1L).collect()
    assert(out.length == 1)
    assert(out(0).getAs[java.sql.Timestamp]("session_start") ==
      ts("2024-01-01 09:55:00"))
    assert(out(0).getAs[Int]("n_events") == 2)
    q.stop()
  }

  test("streaming sessionize matches batch sessionize on ordered data") {
    implicit val sc = spark.sqlContext
    val rows = (1 to 40).map { i =>
      Streams.Ev((i % 4).toLong, ts(f"2024-01-01 ${8 + i / 8}%02d:${(i * 7) % 60}%02d:00"),
        "play", 1.0)
    }
    val mem = MemoryStream[Streams.Ev]
    val q = Streams.sessionize(mem.toDS(), gapMinutes = 30).writeStream
      .format("memory").queryName("parity_sessions")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    mem.addData(Streams.Ev(99L, ts("2024-01-02 12:00:00"), "play", 1.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("parity_sessions")
      .where($"user_id" =!= 99L)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .collect().map(_.toString).sorted

    import org.apache.spark.sql.functions.{col => c}
    val batchClean = graft.operators.StarSchema.clean(
      eventsDf(rows.zipWithIndex.map { case (e, i) =>
        (i.toLong, e.user_id, e.ts.toString.stripSuffix(".0"),
          e.event_type, e.value, "{}")
      }))
    val batch = graft.operators.Analytics.sessionize(batchClean, 30)
      .select(c("user_id"), c("session_start"), c("session_end"),
        c("n_events"))
      .collect().map(_.toString).sorted
    assert(streamed.sameElements(batch))
  }

  test("streaming sessionize matches batch over multi-batch real corpus") {
    // the single-batch parity above cannot exercise state CARRY-OVER:
    // here the sf0.001 events stream in 5 time-ordered micro-batches,
    // so sessions span batch boundaries and close via the event-time
    // timeout path, and the result must still equal the one-shot batch
    // sessionization of the same corpus
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val cleanEv = graft.operators.StarSchema.clean(
      Tables(spark, dir).events)
    val evs = cleanEv
      .select($"user_id", $"ts", $"event_type", $"value")
      .as[Streams.Ev].collect().sortBy(_.ts.getTime)
    val mem = MemoryStream[Streams.Ev]
    val q = Streams.sessionize(mem.toDS(), gapMinutes = 30).writeStream
      .format("memory").queryName("parity_sessions_multi")
      .outputMode(OutputMode.Append).start()
    evs.grouped(evs.length / 5 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq: _*)
      q.processAllAvailable()
    }
    // a far-future sentinel pushes the watermark past every real
    // session's gap so they all close; its own open session is the
    // only state never emitted
    val sentinelTs = new java.sql.Timestamp(
      evs.last.ts.getTime + 7L * 24 * 3600 * 1000)
    mem.addData(Streams.Ev(-1L, sentinelTs, "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("parity_sessions_multi")
      .where($"user_id" =!= -1L)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .collect().map(_.toString).sorted
    val batch = graft.operators.Analytics.sessionize(cleanEv, 30)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .collect().map(_.toString).sorted
    assert(streamed.length == batch.length,
      s"streamed ${streamed.length} vs batch ${batch.length}")
    assert(streamed.sameElements(batch))
  }

  test("stream-stream interval join matches the batch join") {
    // §2.9 depth: a watermarked stream-stream inner join (purchases to
    // same-user plays within the preceding hour) — both sides carry
    // watermarks and the join condition bounds event-time distance, so
    // state is evicted as the watermark advances; the emitted matches
    // must equal the batch join of the same corpus
    val clean = graft.operators.StarSchema.clean(
      Tables(spark, "/root/testdata/sf0.001").events)
      .select($"event_id", $"user_id",
        // watermarks require session-tz TIMESTAMP, not the parquet NTZ
        $"ts".cast("timestamp").as("ts"), $"event_type")
    val streamDir =
      java.nio.file.Files.createTempDirectory("graft_ss_join")
    clean.write.mode("overwrite").parquet(streamDir.toString)
    def side(t: String) = spark.readStream.schema(clean.schema)
      .parquet(streamDir.toString)
      .where($"event_type" === t)
    val plays = side("click")
      .select($"event_id".as("play_id"), $"user_id",
        $"ts".as("play_ts")).withWatermark("play_ts", "1 hour")
    val purchases = side("purchase")
      .select($"event_id".as("buy_id"), $"user_id".as("buyer_id"),
        $"ts".as("buy_ts")).withWatermark("buy_ts", "1 hour")
    val q = plays.join(purchases,
        $"user_id" === $"buyer_id" &&
          $"play_ts" >= $"buy_ts" - expr("INTERVAL 1 HOUR") &&
          $"play_ts" <= $"buy_ts")
      .select($"buy_id", $"play_id")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000))
    val streamed = spark.table("ss_join")
      .collect().map(_.toString).sorted
    val p = clean.where($"event_type" === "click")
      .select($"event_id".as("play_id"), $"user_id",
        $"ts".as("play_ts"))
    val b = clean.where($"event_type" === "purchase")
      .select($"event_id".as("buy_id"), $"user_id".as("buyer_id"),
        $"ts".as("buy_ts"))
    val batch = p.join(b,
        $"user_id" === $"buyer_id" &&
          $"play_ts" >= $"buy_ts" - expr("INTERVAL 1 HOUR") &&
          $"play_ts" <= $"buy_ts")
      .select($"buy_id", $"play_id")
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("stateless curation ops run unchanged on a stream") {
    // qualityFilter and sampleStratified are per-row projections with
    // no state, so the SAME operator body serves batch and streaming —
    // the §2.9 story for the curation family: parity by construction,
    // pinned here over the real corpus
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val streamDir =
      java.nio.file.Files.createTempDirectory("graft_curation_stream")
    docs.write.mode("overwrite").parquet(streamDir.toString)
    val stream = spark.readStream.schema(docs.schema)
      .parquet(streamDir.toString)
    val rates = Seq(("en", 250L))
    val q = graft.operators.TextOps.sampleStratified(
        graft.operators.TextOps.qualityFilter(stream)
          .where($"keep").select($"doc_id", $"lang"), rates)
      .writeStream.format("memory").queryName("curation_stream")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000))
    val streamed = spark.table("curation_stream")
      .collect().map(_.toString).sorted
    val batch = graft.operators.TextOps.sampleStratified(
        graft.operators.TextOps.qualityFilter(docs)
          .where($"keep").select($"doc_id", $"lang"), rates)
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("RunLedger records one row per micro-batch (§2.9 run ledger)") {
    implicit val sc = spark.sqlContext
    val ledger = new graft.streaming.RunLedger
    spark.streams.addListener(ledger)
    try {
      val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
      val df = mem.toDF().toDF("user_id", "ts", "event_type", "value")
      val q = Streams.dedup(df).writeStream
        .format("memory").queryName("ledger_q")
        .outputMode(OutputMode.Append).start()
      mem.addData((1L, ts("2024-01-01 10:00:00"), "play", 1.0))
      q.processAllAvailable()
      mem.addData((2L, ts("2024-01-01 10:01:00"), "play", 2.0))
      q.processAllAvailable()
      q.stop()
      assert(ledger.size >= 2)
      val rows = ledger.toDf(spark)
      assert(rows.where($"query_name" === "ledger_q").count() >= 2)
      assert(rows.agg(org.apache.spark.sql.functions.sum($"num_input_rows"))
        .collect()(0).getLong(0) == 2L)
    } finally spark.streams.removeListener(ledger)
  }

  test("stampedForAppend adds ingestion metadata (S8)") {
    val out = graft.operators.Sinks.stampedForAppend(
      docsDf(Seq((1L, "abc def ghi", "en", "s"))), "unit_test")
    val r = out.collect()(0)
    assert(r.getAs[String]("data_source") == "unit_test")
    assert(r.getAs[java.sql.Timestamp]("stored_at") != null)
  }

  test("multimodal: media schema, stubbed features, frame sampling") {
    val docs = docsDf(Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz0123456789", "en", "s1"),
      (2L, "abcdefghijklmnopqrstuvwxyz0123456789", "en", "s2"),
      (3L, "zzzz", "en", "s3")))
    val media = Multimodal.toMedia(docs)
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bytes"),
          r.getAs[scala.collection.Seq[Float]]("feature").toSeq))
      .toMap
    assert(feats(1L)._1 == 36L)
    assert(feats(1L)._2 == feats(2L)._2) // deterministic stub
    assert(feats(1L)._2 != feats(3L)._2)
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, stride = 2)
    // doc 1: 36 bytes, step 16 -> frames at 0, 16, 32
    assert(frames.where($"doc_id" === 1).count() == 3)
  }

  test("multimodal: resizePayload truncates or zero-pads to exact size") {
    val docs = docsDf(Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz0123456789", "en", "s1"), // 36 > 16
      (2L, "short", "en", "s2"))) // 5 < 16
    val out = Multimodal.resizePayload(Multimodal.toMedia(docs), nBytes = 16)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Array[Byte]]("payload")).toMap
    assert(out(1L).length == 16 && out(2L).length == 16)
    assert(new String(out(1L), "UTF-8") == "abcdefghijklmnop") // prefix kept
    assert(new String(out(2L), 0, 5, "UTF-8") == "short")
    assert(out(2L).drop(5).forall(_ == 0)) // zero padding

    // a null payload resizes to nBytes of zeros — the exactly-nBytes
    // contract holds on dirty input too
    val mediaNull = Seq((9L, "text/plain")).toDF("doc_id", "media_type")
      .withColumn("payload", lit(null).cast("binary"))
      .withColumn("meta", struct(lit("s").as("source"),
        lit("en").as("lang"), lit(null).cast("long").as("n_bytes")))
    val rn = Multimodal.resizePayload(mediaNull, nBytes = 16)
      .collect()(0).getAs[Array[Byte]]("payload")
    assert(rn.length == 16 && rn.forall(_ == 0))
  }
}
