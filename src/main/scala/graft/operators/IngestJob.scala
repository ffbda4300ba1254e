package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.JsonSource

/** EP1 — the collector (dags/spotify/curl_spotify_tracker.py:402-732)
  * as a composed batch job: nested play-event docs arrive (fetched
  * driver-side or dropped as JSON files — see [[JsonSource]]), new
  * catalog entries are discovered set-wise, and every zone is merged
  * idempotently.
  *
  * The reference's per-id Mongo point lookups (S5, :80-100) become one
  * left-anti join per catalog; its replace_one upserts (S6) become
  * keep-newest merges. Everything is a single pass over the batch —
  * no driver-side loops, no per-record round trips.
  */
object IngestJob {

  final case class RawZone(
      plays: DataFrame, // raw listening events, keyed (track_id, played_at)
      trackCatalog: DataFrame, // one row per track_id, newest wins
      playLedger: DataFrame) // per-batch counts (batch_execution_log)

  /** One collector run over a batch of nested docs. `batchSeq` is the
    * strictly-increasing ingestion sequence number that decides which
    * version "wins" in the keep-newest merges — an explicit long, NOT
    * the batch-id string (lexicographic order breaks past "b9"). When
    * omitted it continues from the ledger length. */
  def run(state: Option[RawZone], rawDocs: DataFrame,
      batchId: String, batchSeq: Long = -1L): RawZone = {
    val seq =
      if (batchSeq >= 0) batchSeq
      else state.map(_.playLedger.count()).getOrElse(0L) + 1
    val flat = JsonSource.flatten(rawDocs)
      .withColumn("ingest_batch", lit(seq))

    // S6: plays merge keyed (track_id, played_at) — replays are no-ops.
    val plays = state match {
      case Some(s) => Sinks.upsertKeepNewest(
        s.plays, flat, Seq("track_id", "played_at"), "ingest_batch")
      case None => flat.dropDuplicates("track_id", "played_at")
    }

    // S5+S7: catalog sync — one row per track, newest metadata wins.
    val batchCatalog = flat
      .select(col("track_id"), col("track_name"), col("artist_name"),
        col("album_name"), col("duration_ms"), col("popularity"),
        col("ingest_batch"))
      .dropDuplicates("track_id")
    val catalog = state match {
      case Some(s) => Sinks.upsertKeepNewest(
        s.trackCatalog, batchCatalog, Seq("track_id"), "ingest_batch")
      case None => batchCatalog
    }

    // batch_execution_log analog (:683-691)
    val ledgerRow = flat.agg(
        count(lit(1)).as("records_seen"),
        countDistinct(col("track_id")).as("unique_tracks"))
      .select(lit(batchId).as("batch_id"), col("records_seen"),
        col("unique_tracks"))
    val ledger = state.map(_.playLedger.unionByName(ledgerRow))
      .getOrElse(ledgerRow)

    RawZone(plays, catalog, ledger)
  }
}
