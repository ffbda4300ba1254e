package graft.operators

import graft.operators.Stage.PinOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{QualityFns, TimeFns}

/** The reference's ETL spine (EP2: raw -> clean -> star schema,
  * dags/spotify/daily_etl_pipeline.py) re-expressed as declarative
  * DataFrame transforms over the synthetic `events` table.
  *
  *  - [[clean]]    = P1 nested projection + P2 time derivation + P3
  *    quality tiers (daily_etl_pipeline.py:159-276)
  *  - [[dimUsers]]/[[dimTypes]]/[[dimDates]] = the dim sync stages with
  *    MD5 surrogate ids (daily_etl_pipeline.py:301-430; surrogate
  *    pattern 'artist_' || MD5(name) at :357)
  *  - [[fact]]     = the 4-way star load J1 (daily_etl_pipeline.py:436-503);
  *    dims are broadcast — they are tiny relative to the fact at any
  *    scale, so the fact never shuffles for the join
  *  - [[dailyStats]] = the A4 daily aggregate incl. W1 window argmax
  *    replacing the reference's correlated subqueries
  *    (daily_etl_pipeline.py:509-586, 535-549)
  *
  * `total_plays` on dims is recomputed from the data rather than
  * incremented-on-conflict; the reference's counter (A13) only fires
  * once per batch and is documented as incoherent in SURVEY.md §7.
  */
object StarSchema {
  import TimeFns._
  import org.apache.spark.sql.Column

  /** The MD5 content-hash surrogate keys ('user_'/'type_' || md5(nat)).
    * Single definition — EtlJob's incremental dims derive the same keys
    * from accumulators, and a format drift between the two would only
    * surface as a parity-spec failure. */
  def userKey(userId: Column): Column =
    concat(lit("user_"), md5(userId.cast("string")))
  def typeKey(eventType: Column): Column =
    concat(lit("type_"), md5(eventType))

  /** Clean projection: time fields, quality tiers, JSON prop
    * extraction (P1+P2+P3). `value_cents` is the exact integer view of
    * the 2-decimal metric so downstream SUMs stay deterministic. */
  def clean(events: DataFrame): DataFrame = {
    val d = to_date(col("ts"))
    val h = hour(col("ts"))
    events.select(
      col("event_id"),
      col("user_id"),
      col("ts"),
      d.as("event_date"),
      h.cast("int").as("event_hour"),
      pgDow(d).as("pg_dow"),
      dayName(d).as("day_name"),
      timePeriod(h).as("time_period"),
      isWeekend(d).as("is_weekend"),
      coalesce(nullif(trim(col("event_type")), lit("")), lit("unknown"))
        .as("event_type"),
      col("value"),
      cents(col("value")).as("value_cents"),
      (col("value") / 60.0).as("duration_minutes"),
      get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
      QualityFns.qualityScore(col("event_type"), col("value"))
        .as("quality_score"),
      QualityFns.qualityFlag(col("event_type"), col("value"))
        .as("quality_flag"))
  }

  /** User dimension with MD5 surrogate key + recomputed totals. */
  def dimUsers(clean: DataFrame): DataFrame =
    clean
      .groupBy(col("user_id"))
      .agg(
        min(col("event_date")).as("first_seen"),
        count(lit(1)).as("total_events"),
        countDistinct(col("event_date")).as("active_days"))
      .select(
        userKey(col("user_id")).as("user_key"),
        col("user_id"), col("first_seen"), col("total_events"),
        col("active_days"))

  /** Event-type dimension (dim_tracks analog). */
  def dimTypes(clean: DataFrame): DataFrame =
    clean
      .groupBy(col("event_type"))
      .agg(
        min(col("event_date")).as("first_seen"),
        count(lit(1)).as("total_events"))
      .select(
        typeKey(col("event_type")).as("type_key"),
        col("event_type"), col("first_seen"), col("total_events"))

  /** Calendar dimension spanning [min, max] event date (dim_dates,
    * README.md:208: date_key, date_value, day_name, day_of_week,
    * is_weekend, is_holiday, month_name, year) — generated with
    * sequence()/explode, never collected to the driver. `is_holiday`
    * is a manually-curated enrichment column in the reference (never
    * populated by ETL; SURVEY.md §1.2) — modeled as its default
    * false, LEFT-joinable against a curated holiday table. */
  def dimDates(clean: DataFrame): DataFrame =
    clean
      .agg(min(col("event_date")).as("d0"), max(col("event_date")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("date_value"))
      .select(
        dateKey(col("date_value")).as("date_key"),
        col("date_value"),
        dayName(col("date_value")).as("day_name"),
        pgDow(col("date_value")).as("pg_dow"),
        isWeekend(col("date_value")).as("is_weekend"),
        lit(false).as("is_holiday"),
        date_format(col("date_value"), "MMMM").as("month_name"),
        year(col("date_value")).cast("int").as("year"))

  /** SCD Type-2 user-status dimension — the history-keeping upgrade of
    * the reference's replace-on-upsert dims (S6): instead of
    * overwriting a user's current attribute, every CHANGE of the
    * tracked attribute (the cleaned event_type, read as the user's
    * latest status) opens a new version row with
    * [valid_from, valid_to) validity, and the open version is flagged
    * is_current. Change detection is lag() over (ts, event_id) — the
    * total order makes the version history deterministic under
    * replay — and versions are numbered per user.
    *
    * Scale shape: ONE shuffle on user_id serves the lag pass, the
    * change filter, and the lead/row_number pass (same window spec, so
    * the exchange is reused); state per row is O(1) and no driver-side
    * iteration exists — at 100 TB this is a single sort-shuffle over
    * the fact, the standard SCD2 build. */
  def scd2UserStatus(clean: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    clean
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .withColumn("version_n", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(userKey(col("user_id")).as("user_key"), col("user_id"),
        col("event_type").as("status"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"), col("version_n"))
  }

  /** Star fact load (J1). The reference joins clean rows to dims to
    * fetch SERIAL surrogate keys (daily_etl_pipeline.py:457-461); our
    * surrogates are content hashes of the natural keys — the same
    * scheme the reference itself uses for artist/album ids
    * ('artist_' || MD5(name), :357) — so the dim lookups are
    * identities and the fact derives its keys INLINE: one scan, zero
    * joins, zero shuffles, identical result to the broadcast-join form
    * at any scale. (Genuine J1 broadcast star joins are exercised by
    * the analytics/relational queries, where the dim carries data the
    * fact does not have.) */
  def fact(clean: DataFrame): DataFrame =
    clean.select(
      col("event_id"),
      TimeFns.dateKey(col("event_date")).as("date_key"),
      userKey(col("user_id")).as("user_key"),
      typeKey(col("event_type")).as("type_key"),
      col("value_cents"), col("event_hour"), col("is_weekend"))

  /** A4 daily stats: counts, exact distincts, period-of-day conditional
    * counts, and the top type/user of the day via a window argmax (W1)
    * instead of the reference's correlated LIMIT-1 subqueries. Ties
    * break on name/user ascending for determinism.
    *
    * Plan shape: ONE scan of clean into the finest pre-aggregate
    * (date x user x type) — a single map-side-combined shuffle — then
    * totals, exact distincts, period counts, and both argmaxes all
    * derive from that much smaller cube. This avoids the EXPAND a
    * multi-countDistinct puts on the full fact and the 3 separate
    * scans of the naive base+top+top join. */
  def dailyStats(clean: DataFrame): DataFrame = {
    val cube = clean
      .groupBy(col("event_date"), col("user_id"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value_cents")).as("cents"),
        count(when(col("time_period") === "morning", 1)).as("m"),
        count(when(col("time_period") === "afternoon", 1)).as("a"),
        count(when(col("time_period") === "evening", 1)).as("e"),
        count(when(col("time_period") === "night", 1)).as("n"))
      // consumed by three aggregations below; localCheckpoint (not
      // cache) so the fact scan and cube shuffle run once AND the
      // blocks are released when this frame becomes unreachable —
      // cache() entries live in the CacheManager for the session and
      // leak one cube per call in repeated (per-batch) callers
      .pinned

    val base = cube.groupBy(col("event_date")).agg(
      sum(col("cnt")).as("total_events"),
      sum(col("cents")).as("total_value_cents"),
      sum(col("m")).as("morning_events"),
      sum(col("a")).as("afternoon_events"),
      sum(col("e")).as("evening_events"),
      sum(col("n")).as("night_events"))

    // W1 argmax via the custom single-pass aggregate (ties -> smallest
    // key, mirroring the oracle's ROW_NUMBER tie-break) — no window
    // sort; one hash aggregation per key space.
    def top(keyCol: String, outName: String, distinctName: String)
        : DataFrame =
      cube.groupBy(col("event_date"), col(keyCol))
        .agg(sum(col("cnt")).as("kcnt"))
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as(distinctName),
          call_function("top1_by_count", col(keyCol), col("kcnt"))
            .as(outName))

    base
      .join(top("event_type", "top_type", "unique_types"), Seq("event_date"))
      .join(top("user_id", "top_user", "unique_users"), Seq("event_date"))
      .withColumn("total_value", col("total_value_cents") / lit(100.0))
      .drop("total_value_cents")
  }
}
