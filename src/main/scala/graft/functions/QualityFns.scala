package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-quality scoring (reference: P3 tiers at
  * dags/spotify/daily_etl_pipeline.py:259-270 and the richer P4 record
  * validation at src/spotify/spotify_client.py:472-548).
  *
  * The reference scores CASE-tier style with first-match-wins flags:
  * 0.5 when names are missing, 0.7 when the duration is missing/short,
  * else 1.0. Re-expressed over the synthetic `events` table: a missing
  * event_type is the "missing name" tier, value < 10 is the "short
  * duration" tier. Pure column expressions — no UDFs.
  */
object QualityFns {

  private def missingType(eventType: Column): Column =
    eventType.isNull || trim(eventType) === ""

  /** Quality score tier (first match wins, like the reference CASE). */
  def qualityScore(eventType: Column, value: Column): Column =
    when(missingType(eventType), 0.5)
      .when(value.isNull || value < 10.0, 0.7)
      .otherwise(1.0)

  /** First-match-wins single quality flag ('' when clean). The
    * reference emits ARRAY['tag'] / ARRAY[]::TEXT[]; we surface the
    * scalar tag (portable across engines) and [[qualityFlagsArray]]
    * keeps the array form for API parity. */
  def qualityFlag(eventType: Column, value: Column): Column =
    when(missingType(eventType), "missing_type")
      .when(value.isNull || value < 10.0, "short_duration")
      .otherwise("")

  /** Array form matching the reference's TEXT[] column. */
  def qualityFlagsArray(eventType: Column, value: Column): Column =
    when(missingType(eventType), array(lit("missing_type")))
      .when(value.isNull || value < 10.0, array(lit("short_duration")))
      .otherwise(array().cast("array<string>"))
}
