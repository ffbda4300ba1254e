package graft

import graft.operators.TextOps
import graft.streaming.Streams

/** Streaming/batch parity for the dedup family's exact member: folding
  * per-micro-batch dedupExact increments through
  * [[Streams.dedupExactSink]] must converge to the one-shot batch
  * answer for ANY slicing of the corpus (min/sum are associative and
  * commutative — the property the sink relies on). */
class StreamDedupParitySpec extends SparkSpec {

  test("streaming dedupExact over sliced corpus equals the batch result") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir).documents
    val expected = TextOps.dedupExact(docs).collect().map(_.toString).sorted

    // slice the corpus into 3 files -> 3 micro-batches
    val streamDir =
      java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_dedup_state").resolve("state").toString
    docs.repartition(3).write.mode("overwrite").parquet(streamDir.toString)

    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
    val q = Streams.dedupExactSink(stream, statePath)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_dedup_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not finish in time")

    val got = Streams.dedupState(spark, statePath)
      .collect().map(_.toString).sorted
    assert(got.length == expected.length)
    assert(got.sameElements(expected))
  }
}
