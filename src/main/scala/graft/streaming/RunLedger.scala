package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming run ledger (SURVEY.md §2.9 "run ledger"): the reference
  * writes an etl_batch_log row per run (daily_etl_pipeline.py:588-655)
  * and a Mongo batch_execution_log (curl_spotify_tracker.py:683-695);
  * the Structured Streaming form is a StreamingQueryListener recording
  * one row per micro-batch — query name, batch id, rows in, duration,
  * watermark — queryable as a DataFrame and appendable to a ledger
  * table.
  */
object RunLedger {
  /** Top-level case class so Spark can derive its encoder. */
  final case class BatchRun(
      query_name: String,
      run_id: String,
      batch_id: Long,
      num_input_rows: Long,
      batch_duration_ms: Long,
      event_time_watermark: Option[String])
}

final class RunLedger extends StreamingQueryListener {
  import RunLedger.BatchRun

  private val runs = ArrayBuffer.empty[BatchRun]

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit =
    runs.synchronized {
      val p = e.progress
      runs += BatchRun(
        Option(p.name).getOrElse(""),
        p.runId.toString,
        p.batchId,
        p.numInputRows,
        Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(-1L),
        Option(p.eventTime).flatMap(m => Option(m.get("watermark"))))
    }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** Ledger snapshot as a DataFrame (ready to append to a table). */
  def toDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    runs.synchronized { runs.toSeq }.toDF()
  }

  /** Drain: return the accumulated rows and clear the buffer — the
    * append-to-ledger-table primitive. Without draining, a long-lived
    * stream grows the driver-side buffer without bound and every
    * append would re-write already-persisted rows. */
  def drain(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val snapshot = runs.synchronized {
      val s = runs.toSeq
      runs.clear()
      s
    }
    snapshot.toDF()
  }

  def size: Int = runs.synchronized(runs.size)
}
