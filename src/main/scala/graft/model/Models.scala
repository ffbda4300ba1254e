package graft.model

import java.sql.Timestamp

/** Typed API surface (SURVEY.md §1.3: `Dataset[T]` case classes over
  * the DataFrame core). The DataFrame operators stay the engine's
  * workhorses — these encoders give callers compile-time column safety
  * at the API boundary, via [[graft.Tables.typed]].
  */
final case class Event(
    event_id: Long,
    user_id: Long,
    ts: Timestamp,
    event_type: String,
    value: Double,
    props: String)

final case class CleanEvent(
    event_id: Long,
    user_id: Long,
    event_date: java.sql.Date,
    event_hour: Int,
    time_period: String,
    is_weekend: Boolean,
    event_type: String,
    value_cents: Long,
    quality_score: Double,
    quality_flag: String)

final case class Document(
    doc_id: Long,
    text: String,
    lang: String,
    source: String,
    n_chars: Long)

final case class Embedding(
    vec_id: Long,
    embedding: Array[Float],
    label: Int)

final case class DimUser(
    user_key: String,
    user_id: Long,
    first_seen: java.sql.Date,
    total_events: Long,
    active_days: Long)

final case class FactEvent(
    event_id: Long,
    date_key: Int,
    user_key: String,
    type_key: String,
    value_cents: Long,
    event_hour: Int,
    is_weekend: Boolean)
