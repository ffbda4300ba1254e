package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.streaming.Streams

class SkewStreamParitySpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join result") {
    val big = (1 to 5000).map(i => (i.toLong % 3, i.toLong)) // 3 hot keys
      .toDF("k", "v")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (9L, "unmatched"))
      .toDF("k", "tag")
    val plain = big.join(small, Seq("k"))
    val salted = Skew.saltedJoin(big, small, "k", "v", buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin flattens ADVERSARIAL skew (one key = 50% of rows)") {
    // the uniform-key parity test above proves correctness; this one
    // proves the POINT of salting: under a single dominant key the
    // unsalted shuffle hot-spots one reducer with >= half the data,
    // and the salted plan spreads it. Partition row counts after the
    // key shuffle are the deterministic proxy for task time. AQE and
    // broadcast are pinned off so the measured distribution is the
    // plan's own, not a runtime rescue.
    val n = 100000L
    val hot = spark.range(n / 2).select(lit(0L).as("k"), $"id".as("v"))
    val rest = spark.range(n / 2).select(
      (pmod(hash($"id"), lit(99)) + 1).cast("long").as("k"), $"id".as("v"))
    val big = hot.unionAll(rest)
    val small = spark.range(100).select($"id".as("k"),
      concat(lit("dim"), $"id").as("tag"))

    def partitionSpread(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val sizes = df.rdd
        .mapPartitions(it => Iterator(it.size.toLong), true)
        .collect().sorted
      (sizes.max, sizes(sizes.length / 2))
    }

    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "32")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val unsalted = big.join(small, Seq("k"))
      val salted = Skew.saltedJoin(big, small, "k", "v", buckets = 32)
      // same answer...
      assert(salted.count() == unsalted.count())
      // ...but the unsalted plan funnels the hot key through ONE
      // reducer (>= 50% of all rows in the max partition), while the
      // salted plan's max partition is a small multiple of the median
      val (maxU, medU) = partitionSpread(unsalted)
      val (maxS, medS) = partitionSpread(salted)
      assert(maxU >= n / 2, s"hot partition should hold the hot key, got $maxU")
      val ratioU = maxU.toDouble / math.max(1L, medU)
      val ratioS = maxS.toDouble / math.max(1L, medS)
      assert(ratioS * 4 < ratioU,
        s"salting must collapse the max/median spread: " +
          s"unsalted $ratioU (max=$maxU med=$medU), " +
          s"salted $ratioS (max=$maxS med=$medS)")
      assert(maxS * 4 < maxU,
        s"salted max partition $maxS not < 1/4 of unsalted $maxU")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("saltedCount matches plain groupBy counts") {
    val df = (1 to 4000).map(i => (if (i % 10 == 0) "rare" else "hot", i))
      .toDF("k", "v")
    val plain = df.groupBy($"k").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedCount(df, "k", "v", buckets = 16)
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("EtlJob batch replay equals streaming dedup over day-sliced input") {
    // the same day-sliced event feed, with one slice re-delivering
    // rows from an earlier slice, driven down BOTH incremental paths:
    //  - batch: EtlJob.run folded per slice (layered insertIfAbsent
    //    dedup on (user_id, ts))
    //  - streaming: file-per-micro-batch StarSchema.clean +
    //    Streams.dedup on the same key
    // Both must land on the identical clean row set — the batch and
    // streaming dedup are the same operator, not two approximations.
    import graft.operators.{EtlJob, StarSchema}
    // watermarks require TIMESTAMP (not NTZ); cast once so BOTH paths
    // consume identical input (session tz is UTC — deterministic)
    val events = Tables(spark, "/root/testdata/sf0.001").events
      .withColumn("ts", $"ts".cast("timestamp"))
    val dates = events.select(to_date($"ts").as("d")).distinct()
      .orderBy($"d").as[java.sql.Date].collect()
    val slices = (0 until 3).map { i =>
      val own = dates.zipWithIndex.collect {
        case (d, j) if j % 3 == i => d
      }.toSet
      events.where(to_date($"ts").isInCollection(own))
    }
    // slice 2 re-delivers every row of slice 0: cross-batch duplicates
    val feed = Seq(slices(0), slices(1), slices(2).unionAll(slices(0)))
    // canonical column order for comparison: insertIfAbsent's join
    // puts its key columns first, so the two sides' frames agree on
    // COLUMNS but not on their order
    val cols = StarSchema.clean(events).columns.sorted.toSeq

    val batchFinal = feed.zipWithIndex
      .foldLeft(Option.empty[EtlJob.EtlState]) { case (st, (b, i)) =>
        Some(EtlJob.run(st, b, s"b$i"))
      }.get.clean
      .select(cols.map(col): _*)
      .collect().map(_.toString).sorted

    val streamDir = java.nio.file.Files
      .createTempDirectory("graft_etl_stream")
    feed.foreach(_.coalesce(1).write.mode("append")
      .parquet(streamDir.toString))
    val streamed = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
    // the watermark is held WIDER than the corpus on purpose: the
    // micro-batches arrive day-interleaved (file order is not the
    // event-time order), and a tight watermark would discard whole
    // slices as late data before the dedup state ever saw them. This
    // spec pins dedup-operator parity; lateness semantics are pinned
    // separately by the watermark-bounded dedup specs.
    val q = Streams.dedup(StarSchema.clean(streamed), "3650 days")
      .writeStream.format("memory").queryName("etl_dedup_parity")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not finish in time")
    val streamFinal = spark.table("etl_dedup_parity")
      .select(cols.map(col): _*)
      .collect().map(_.toString).sorted

    assert(streamFinal.length == batchFinal.length,
      s"streaming ${streamFinal.length} rows vs batch ${batchFinal.length}")
    val onlyBatch = batchFinal.diff(streamFinal)
    val onlyStream = streamFinal.diff(batchFinal)
    assert(onlyBatch.isEmpty && onlyStream.isEmpty,
      s"batch-only (${onlyBatch.length}): ${onlyBatch.take(2).mkString(" | ")}; " +
        s"stream-only (${onlyStream.length}): ${onlyStream.take(2).mkString(" | ")}")
  }

  test("streaming hourly counts over the real events equal the batch result") {
    // stream the sf0.001 events parquet with Trigger.AvailableNow and
    // compare against the same aggregation run as a batch query
    val dir = "/root/testdata/sf0.001"
    val batchEvents = Tables(spark, dir).events
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"event_type",
        $"value")
    val expected = batchEvents
      .groupBy(date_trunc("hour", $"ts").as("hour_start"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .collect().map(_.toString).sorted

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file streams consume directories: stage the single parquet file
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    // ts normalization mirrors Tables.events: nanos-as-long vintage
    // needs the ns->us truncation, the TIMESTAMP(MICROS) vintage only
    // re-types
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val tsCol = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp")
      case _ => $"ts".cast("timestamp")
    }
    val streamEvents = spark.readStream
      .schema(rawSchema)
      .parquet(streamDir.toString)
      .withColumn("ts", tsCol)
      .select($"user_id", $"ts", $"event_type", $"value")
    val q = Streams.hourlyCounts(streamEvents, watermark = "0 seconds")
      .writeStream.format("memory").queryName("parity_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("parity_out")
      .select($"hour_start", $"event_type", $"n_events")
      .collect().map(_.toString).sorted
    assert(got.length == expected.length)
    assert(got.sameElements(expected))
  }
}
