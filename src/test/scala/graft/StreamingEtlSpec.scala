package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EtlJob

/** The streaming form of EP2: EtlJob.run applied per micro-batch via
  * foreachBatch — the pattern a production deployment uses to drive the
  * same batch logic from a stream with exactly-once sinks. */
class StreamingEtlSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch-driven EtlJob equals the one-shot batch run") {
    val rows = (1 to 60).map { i =>
      (i.toLong, (i % 5).toLong,
        ts(f"2024-01-0${1 + i % 3} ${i % 24}%02d:30:00"),
        Seq("play", "skip")(i % 2), i * 0.5, "{}")
    }
    val full = EtlJob.run(None,
      rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props"),
      "full")

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double,
      String)]
    @volatile var state: Option[EtlJob.EtlState] = None
    val q = mem.toDF()
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // foreachBatch hands over a streaming-bound frame; pin it to a
        // local batch frame before running the batch job
        val local = batch.sparkSession.createDataFrame(
          batch.collectAsList(), batch.schema)
        state = Some(EtlJob.run(state, local, s"stream_$id"))
        ()
      }
      .start()
    mem.addData(rows.take(30))
    q.processAllAvailable()
    mem.addData(rows.drop(20)) // overlap: events 21-30 delivered twice
    q.processAllAvailable()
    q.stop()

    val got = state.get
    def canon(df: DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.select(cols.map(col).toIndexedSeq: _*).collect()
        .map(_.toString).toSeq.sorted
    }
    assert(canon(got.fact) == canon(full.fact))
    assert(canon(got.dailyStats) == canon(full.dailyStats))
    assert(canon(got.dimUsers) == canon(full.dimUsers))
  }
}
