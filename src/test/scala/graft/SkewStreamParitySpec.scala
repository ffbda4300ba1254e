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
    val streamEvents = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(streamDir.toString)
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp"))
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
