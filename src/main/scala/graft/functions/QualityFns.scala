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

  /** P4 record-level multi-rule score (spotify_client.py:472-548:
    * score = min((10 - issues + bonuses)/10, 1.0) rounded to 3):
    * issue/bonus counts are exact integers and the score is ONE final
    * division by 1000, so the value is deterministic and the
    * reference's 3-decimal rounding is trivially satisfied (all scores
    * are multiples of 0.1). Re-expressed over the events columns: an
    * issue per missing/blank type, missing-or-short value, and empty
    * props; a bonus for a rich (value > 100) record. */
  def recordScore(eventType: Column, value: Column,
      props: Column): Column = {
    val issues =
      when(missingType(eventType), 1).otherwise(0) +
        when(value.isNull || value < 10.0, 1).otherwise(0) +
        when(props.isNull || props === "{}" || trim(props) === "", 1)
          .otherwise(0)
    val bonuses = when(value > 100.0, 1).otherwise(0)
    val x1000 = least(greatest((lit(10) - issues + bonuses) * 100, lit(0)),
      lit(1000))
    x1000.cast("double") / lit(1000.0)
  }
}
