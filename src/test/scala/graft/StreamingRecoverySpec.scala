package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.operators.EtlJob

/** Checkpoint recovery for the streaming EP2 (§2.9): a file-source
  * stream driving EtlJob.run through foreachBatch is stopped (the
  * "kill"), more files land while it is down, and a NEW query resumes
  * from the same checkpoint. Pins the two recovery guarantees:
  *
  *  1. the resumed query does NOT re-read files the checkpoint already
  *     committed (asserted on the resumed run's input row count);
  *  2. the final state converges to the one-shot batch run even though
  *     the incoming files overlap (EtlJob's layered upsert keys make
  *     any redelivered rows idempotent).
  */
class StreamingRecoverySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def row(i: Int): (Long, Long, String, String, Double) =
    (i.toLong, (i % 5).toLong,
      f"2024-01-0${1 + i % 3} ${i % 24}%02d:30:00",
      Seq("play", "skip")(i % 2), i * 0.5)

  /** Write one JSON-lines file atomically (temp + move) so the file
    * source never lists a half-written file. */
  private def writeFile(dir: Path, name: String, is: Seq[Int]): Unit = {
    val lines = is.map { i =>
      val (id, u, t, ty, v) = row(i)
      s"""{"event_id":$id,"user_id":$u,"ts":"$t","event_type":"$ty","value":$v,"props":"{}"}"""
    }
    val tmp = Files.createTempFile("graft_evt", ".tmp")
    Files.writeString(tmp, lines.mkString("\n"))
    Files.move(tmp, dir.resolve(name))
  }

  /** One stream run over the source dir: start -> drain -> stop.
    * Returns the carried EtlState and how many input rows this run's
    * micro-batches actually delivered. */
  private def runStream(src: Path, ckpt: Path,
      state0: Option[EtlJob.EtlState], tag: String)
      : (Option[EtlJob.EtlState], Long) = {
    @volatile var state = state0
    @volatile var rowsSeen = 0L
    val q = spark.readStream.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .json(src.toString)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // pin the streaming-bound frame to a local batch frame before
        // handing it to the batch job (same pattern as StreamingEtlSpec)
        val local = batch.sparkSession.createDataFrame(
          batch.collectAsList(), batch.schema)
        rowsSeen += local.count()
        state = Some(EtlJob.run(state, local, s"${tag}_$id"))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    (state, rowsSeen)
  }

  test("stream killed and resumed from checkpoint converges to batch") {
    val src = Files.createTempDirectory("graft_stream_src")
    val ckpt = Files.createTempDirectory("graft_stream_ckpt")

    // phase 1: first file, run, "kill"
    writeFile(src, "part-001.json", 1 to 30)
    val (state1, seen1) = runStream(src, ckpt, None, "run1")
    assert(seen1 == 30L)

    // while down: a second file lands, overlapping rows 21-30
    writeFile(src, "part-002.json", 21 to 60)

    // phase 2: NEW query, same checkpoint — must see ONLY the new file
    val (state2, seen2) = runStream(src, ckpt, state1, "run2")
    assert(seen2 == 40L,
      s"resumed query re-read committed files (saw $seen2 rows, expected 40)")

    // reference: one-shot batch over the union (duplicates included —
    // the upsert keys collapse them exactly like the stream path)
    val full = EtlJob.run(None,
      eventsDf(((1 to 30) ++ (21 to 60)).map { i =>
        val (id, u, t, ty, v) = row(i); (id, u, t, ty, v, "{}")
      }), "full")

    val got = state2.get
    def canon(df: DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.select(cols.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*).collect().map(_.toString).toSeq.sorted
    }
    assert(canon(got.fact) == canon(full.fact))
    assert(canon(got.dailyStats) == canon(full.dailyStats))
    assert(canon(got.dimUsers) == canon(full.dimUsers))
    assert(canon(got.dimTypes) == canon(full.dimTypes))
  }
}
