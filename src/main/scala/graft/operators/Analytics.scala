package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TimeFns

/** The reference's dashboard analytics surface (EP3, the SQL loaders
  * under dashboard/sql_query/) as reusable DataFrame operators over the
  * cleaned events (see [[StarSchema.clean]]).
  *
  * Window-shaped results the reference hand-rolls with joins /
  * correlated subqueries / pandas post-processing are expressed with
  * real Window specs (SURVEY.md §2.5 W1-W3).
  *
  * Float determinism: every aggregate is either an exact integer
  * (cents / counts) or a single IEEE division of exact values, so
  * results are bit-identical to the DuckDB oracle.
  */
object Analytics {
  import TimeFns._

  /** J6+A10 (dashboard/sql_query/main_heatmap.py:17-40): zero-filled
    * (date x hour) grid via sequence()/explode over the hour range —
    * the Spark form of generate_series LEFT JOIN fact. */
  def heatmap(clean: DataFrame): DataFrame = {
    val grid = clean
      .agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        max(col("ts")).as("h1"))
      .select(explode(
        sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
      .select(
        to_date(col("h")).as("grid_date"),
        hour(col("h")).cast("int").as("grid_hour"))
    val hourly = clean
      .groupBy(col("event_date").as("grid_date"),
        col("event_hour").as("grid_hour"))
      .agg(count(lit(1)).as("cnt"), sum(col("value_cents")).as("cents"))
    grid.join(hourly, Seq("grid_date", "grid_hour"), "left")
      .select(
        col("grid_date"), col("grid_hour"),
        coalesce(col("cnt"), lit(0L)).as("n_events"),
        (coalesce(col("cents"), lit(0L)) / lit(100.0)).as("total_value"))
  }

  /** A1+A2+W2/J8 (main_ratio.py:14-79): per (dow, time_period) share of
    * the day's total — ratio-to-partition-total via a window SUM
    * instead of the reference's join to a day_totals CTE. */
  def hourRatio(clean: DataFrame): DataFrame = {
    val byPeriod = clean
      .groupBy(col("pg_dow"), col("day_name"), col("time_period"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_cents")).as("cents"))
    val w = Window.partitionBy(col("pg_dow"))
    byPeriod
      .withColumn("day_cents", sum(col("cents")).over(w))
      .select(
        col("pg_dow"), col("day_name"), col("time_period"), col("n_events"),
        (col("cents") / lit(100.0)).as("total_value"),
        (col("cents") * lit(100.0) / col("day_cents")).as("pct_of_day"))
  }

  /** A3 (main_ratio.py:98-153): weekday-vs-weekend behavioral radar.
    * stddev is computed from exact integer sums with an explicit
    * sqrt((s2 - s1^2/n)/(n-1)) so both engines evaluate the identical
    * IEEE expression (Spark's stddev_samp and DuckDB's differ in
    * accumulation order). */
  def radar(clean: DataFrame): DataFrame =
    clean
      .withColumn("day_type",
        when(col("is_weekend"), "Weekend").otherwise("Weekday"))
      .groupBy(col("day_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value_cents")).as("s1"),
        // squared cents (~1e10/row) would overflow a Long sum around
        // 1e9 rows per group — decimal(38,0) stays exact at any scale
        sum((col("value_cents") * col("value_cents")).cast("decimal(38,0)"))
          .as("s2"),
        countDistinct(col("user_id")).as("unique_users"),
        countDistinct(col("event_type")).as("unique_types"),
        countDistinct(col("event_date")).as("active_days"),
        count(when(col("event_type") === "error", 1)).as("error_events"),
        count(when(col("event_hour").between(6, 18), 1)).as("daytime_events"))
      .select(
        col("day_type"), col("n_events"),
        (col("s1") / lit(100.0)).as("total_value"),
        (col("s1") / lit(100.0) / col("n_events")).as("avg_value"),
        col("unique_users"), col("unique_types"), col("active_days"),
        col("error_events"),
        (lit(100.0) * col("daytime_events") / col("n_events"))
          .as("pct_daytime"),
        (sqrt(
          (col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") /
              col("n_events")) /
            (col("n_events") - lit(1))) / lit(100.0)).as("stddev_value"))

  /** A5 (artist_loyal.py:13-54): per-user loyalty — active days over
    * the min..max span, HAVING >= minEvents, top-100 by ratio. */
  def loyalty(clean: DataFrame, minEvents: Int = 3): DataFrame =
    clean
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("event_date")).as("active_days"),
        min(col("event_date")).as("first_date"),
        max(col("event_date")).as("last_date"))
      .where(col("total_events") >= minEvents)
      .withColumn("span_days",
        datediff(col("last_date"), col("first_date")) + lit(1))
      // ROUND(ratio, n) on doubles is an engine-dependent trap (Spark
      // rounds the shortest decimal repr, DuckDB rounds x*10^n in FP —
      // they disagree on exact-decimal midpoints like 107/40). Round in
      // exact integer arithmetic instead: half-up(p/q * 10^n) =
      // (2*10^n*p + q) div (2*q), then ONE exact division to surface.
      .withColumn("loyalty_ratio",
        expr("(2000 * active_days + span_days) div (2 * span_days)")
          / lit(1000.0))
      .withColumn("avg_events_per_day",
        expr("(200 * total_events + span_days) div (2 * span_days)")
          / lit(100.0))
      .orderBy(col("loyalty_ratio").desc, col("total_events").desc,
        col("user_id").asc)
      .limit(100)

  /** A6 (track_sankey.py:13-59): per-user lifecycle funnel — conditional
    * counts relative to the first event (W5) + CASE categorization. */
  def lifecycle(clean: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val withFirst =
      clean.withColumn("first_date", min(col("event_date")).over(w))
    val age = datediff(col("event_date"), col("first_date"))
    withFirst
      .groupBy(col("user_id"), col("first_date"))
      .agg(
        count(lit(1)).as("total_events"),
        count(when(age === 0, 1)).as("day0_events"),
        count(when(age.between(0, 7), 1)).as("week1_events"),
        count(when(age.between(0, 30), 1)).as("month1_events"),
        max(col("event_date")).as("last_date"))
      .withColumn("conversion_category",
        when(col("total_events") === 1, "single")
          .when(col("total_events") <= 5, "casual")
          .when(col("total_events") <= 15, "regular")
          .otherwise("heavy"))
      .withColumn("lifecycle_stage",
        when(datediff(col("last_date"), col("first_date")) <= 3, "burst")
          .when(datediff(col("last_date"), col("first_date")) <= 7, "week")
          .when(datediff(col("last_date"), col("first_date")) <= 14,
            "fortnight")
          .otherwise("sustained"))
  }

  /** Robust daily-volume anomaly detection by exact median/MAD — the
    * monitoring query a pipeline points at its own daily counts
    * (z-scores break on the outliers they hunt; median absolute
    * deviation does not): a day is anomalous when its absolute
    * deviation from the LOWER MEDIAN of daily counts exceeds k times
    * the MAD, everything in exact integers (the lower median — the
    * sorted value at rank (n+1) div 2 — stays an actual count, no
    * float midpoint). The windows order DATE-cardinality frames
    * (bounded by calendar time, never the corpus — the day-frame
    * exception, like the 1-row med/MAD broadcasts). */
  def anomalyDays(clean: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val d = clean.groupBy(col("event_date"))
      .agg(count(lit(1)).as("n_events"))
    val nDays = d.agg(count(lit(1)).as("n_days"))
    val wc = Window.orderBy(col("n_events"), col("event_date"))
    val med = d.withColumn("rn", row_number().over(wc))
      .join(broadcast(nDays), lit(true))
      .where(col("rn") === expr("(n_days + 1) div 2"))
      .select(col("n_events").as("med"))
    val withMed = d.join(broadcast(med), lit(true))
      .withColumn("abs_dev", abs(col("n_events") - col("med")))
    val wa = Window.orderBy(col("abs_dev"), col("event_date"))
    val mad = withMed.withColumn("rn", row_number().over(wa))
      .join(broadcast(nDays), lit(true))
      .where(col("rn") === expr("(n_days + 1) div 2"))
      .select(col("abs_dev").as("mad"))
    withMed.join(broadcast(mad), lit(true))
      .select(col("event_date"), col("n_events"), col("med"),
        col("mad"), (col("abs_dev") > col("mad") * k).as("is_anomaly"))
  }

  /** Ordered conversion funnel (view -> click -> purchase): a user
    * reaches a stage only through an event STRICTLY AFTER the
    * previous stage's first qualifying event AND within its
    * `windowHours` attribution window — the time-ordering and the
    * window are what separate a funnel from three independent counts
    * (a user who clicked before ever viewing, or days later, does
    * not convert). First qualifying timestamps are min-aggregates
    * (deterministic; an event tying the previous stage's instant is
    * excluded identically in both engines). Per-stage frames are
    * user-keyed aggregates; the report is one row with exact
    * permille conversion rates. */
  def funnel(clean: DataFrame, windowHours: Int = 24): DataFrame = {
    require(windowHours >= 1,
      s"windowHours must be >= 1, got $windowHours")
    val win = expr(s"INTERVAL $windowHours HOURS")
    val v = clean.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = clean.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
      .join(v, Seq("user_id"))
      .where(col("ts") > col("t_view") && col("ts") <= col("t_view") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = clean.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .join(c, Seq("user_id"))
      .where(col("ts") > col("t_click") &&
        col("ts") <= col("t_click") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    clean.select(col("user_id")).distinct()
      .join(v.select(col("user_id"), lit(1L).as("s1")),
        Seq("user_id"), "left")
      .join(c.select(col("user_id"), lit(1L).as("s2")),
        Seq("user_id"), "left")
      .join(p.select(col("user_id"), lit(1L).as("s3")),
        Seq("user_id"), "left")
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("s1"), lit(0L))).as("n_viewed"),
        sum(coalesce(col("s2"), lit(0L))).as("n_clicked_after"),
        sum(coalesce(col("s3"), lit(0L))).as("n_purchased_after"))
      .select(col("n_users"), col("n_viewed"), col("n_clicked_after"),
        col("n_purchased_after"),
        expr("n_clicked_after * 1000 div n_viewed").as("click_permille"),
        expr("n_purchased_after * 1000 div n_clicked_after")
          .as("purchase_permille"))
  }

  /** Weekly cohort retention — the classic activation dashboard the
    * reference's lifecycle module stops one step short of: users
    * cohorted by FIRST event date, each (cohort, week-offset) cell
    * counts the distinct cohort members active that week, and
    * retention is the exact permille of the cohort's week-0 size.
    * One window for first_date (user-keyed, same shuffle the
    * lifecycle query uses), one distinct + aggregate on
    * (cohort, offset, user), a cohort-keyed join against the tiny
    * week-0 slice. All integer arithmetic (`div 7` offsets, permille
    * by integer division) — bit-replayable. */
  def cohortRetention(clean: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val act = clean
      .withColumn("first_date", min(col("event_date")).over(w))
      .select(col("user_id"), col("first_date").as("cohort_date"),
        expr("CAST(datediff(event_date, first_date) div 7 AS BIGINT)")
          .as("week_offset"))
      .distinct()
    val counts = act.groupBy(col("cohort_date"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val size = counts.where(col("week_offset") === 0)
      .select(col("cohort_date"), col("n_users").as("cohort_size"))
    counts.join(size, Seq("cohort_date"))
      .select(col("cohort_date"), col("week_offset"), col("n_users"),
        col("cohort_size"),
        expr("n_users * 1000 div cohort_size").as("retention_permille"))
  }

  /** A7/W4 (artist_treemap.py:22-38): top-K keys by count, deterministic
    * tie-break on the key. Spark compiles orderBy+limit to a
    * distributed TakeOrderedAndProject — no global sort. */
  def topN(clean: DataFrame, key: String, k: Int): DataFrame =
    clean.groupBy(col(key))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("value_cents")) / lit(100.0)).as("total_value"))
      .orderBy(col("n_events").desc, col(key).asc)
      .limit(k)

  /** W1 generalized: top-k keys per group (not just the argmax) via a
    * ranking window over the pre-aggregated counts. The window sorts
    * the (date x type) aggregate, never the fact — the heavy input is
    * reduced by one map-side-combined shuffle first. */
  def topKPerDay(clean: DataFrame, k: Int = 3): DataFrame = {
    val cnt = clean.groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_date"))
      .orderBy(col("n_events").desc, col("event_type").asc)
    cnt.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** A8 (dashboard/artist.py:22-34): discovery counts by epoch-week
    * bucket of each user's first event. */
  def discoveryWeekly(clean: DataFrame): DataFrame =
    clean
      .groupBy(col("user_id"))
      .agg(min(col("event_date")).as("first_date"))
      .groupBy(epochWeek(col("first_date")).as("week_bucket"))
      .agg(min(col("first_date")).as("week_start"),
        count(lit(1)).as("new_users"))

  /** W3 (dashboard/artist.py:23-36 pandas delta): per-day counts with
    * the previous day's delta via lag() — the idiomatic form of the
    * reference's result[0]-result[1] post-processing. */
  def dailyDelta(clean: DataFrame): DataFrame = {
    val w = Window.orderBy(col("event_date"))
    clean.groupBy(col("event_date"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("prev_events", lag(col("n_events"), 1).over(w))
      .withColumn("delta", col("n_events") - col("prev_events"))
  }

  /** J2 anti-join (daily_etl_pipeline.py:272-275 NOT EXISTS): users
    * with no event of the given type. */
  def usersWithout(clean: DataFrame, eventType: String): DataFrame =
    clean.select(col("user_id")).distinct()
      .join(
        clean.where(col("event_type") === eventType)
          .select(col("user_id")).distinct(),
        Seq("user_id"), "left_anti")

  /** S6/§2.9 keyed dedup: one row per (user_id, ts) keeping the lowest
    * event_id — the batch form of dropDuplicates with a deterministic
    * survivor. Surfaced with epoch micros so the key is
    * timestamp-precision-proof across engines. */
  def dedupKeepFirst(clean: DataFrame): DataFrame =
    clean
      .groupBy(col("user_id"), unix_micros(col("ts").cast("timestamp"))
        .as("ts_us"))
      .agg(min(col("event_id")).as("kept_event_id"),
        count(lit(1)).as("n_dupes"))

  /** §2.7: the set-operation surface (UNION/INTERSECT/EXCEPT) over the
    * user populations of the first vs second half of the data window. */
  def setOps(clean: DataFrame): DataFrame = {
    val split = clean.agg(date_add(min(col("event_date")), 15).as("s"))
    val tagged = clean.crossJoin(broadcast(split))
    val h1 = tagged.where(col("event_date") < col("s"))
      .select(col("user_id")).distinct()
    val h2 = tagged.where(col("event_date") >= col("s"))
      .select(col("user_id")).distinct()
    h1.intersect(h2).select(lit("both").as("tag"), col("user_id"))
      .unionAll(h1.except(h2).select(lit("only_h1").as("tag"), col("user_id")))
      .unionAll(h2.except(h1).select(lit("only_h2").as("tag"), col("user_id")))
      .unionAll(h1.union(h2).distinct()
        .select(lit("any").as("tag"), col("user_id")))
  }

  /** §2.7 multiset forms: INTERSECT ALL / EXCEPT ALL keep duplicate
    * multiplicity (min / difference of per-row counts) — the bag
    * semantics sibling of [[setOps]]'s distinct forms. Input rows are
    * (event_type, event_hour) pairs from each half of the window, so
    * multiplicities are real. */
  def setOpsAll(clean: DataFrame): DataFrame = {
    val split = clean.agg(date_add(min(col("event_date")), 15).as("s"))
    val tagged = clean.crossJoin(broadcast(split))
    val h1 = tagged.where(col("event_date") < col("s"))
      .select(col("event_type"), col("event_hour"))
    val h2 = tagged.where(col("event_date") >= col("s"))
      .select(col("event_type"), col("event_hour"))
    h1.intersectAll(h2)
      .select(lit("common_bag").as("tag"), col("event_type"),
        col("event_hour"))
      .unionAll(h1.exceptAll(h2)
        .select(lit("h1_surplus").as("tag"), col("event_type"),
          col("event_hour")))
  }

  /** A8 (dashboard/artist.py:22): discovery counts at daily grain. */
  def discoveryDaily(clean: DataFrame): DataFrame =
    clean.groupBy(col("user_id"))
      .agg(min(col("event_date")).as("first_date"))
      .groupBy(col("first_date"))
      .agg(count(lit(1)).as("new_users"))

  /** A8 (dashboard/artist.py:34): discovery counts at month grain
    * (DATE_TRUNC('month', ...)). */
  def discoveryMonthly(clean: DataFrame): DataFrame =
    clean.groupBy(col("user_id"))
      .agg(min(col("event_date")).as("first_date"))
      .groupBy(trunc(col("first_date"), "month").as("month_start"))
      .agg(count(lit(1)).as("new_users"))

  /** A9 (artist_gender.py/artist_band.py): grouped counts by an
    * enrichment attribute LEFT-joined from a separate dimension — here
    * the customer market segment keyed by user_id. The enrichment dim
    * grows with the user population, so the join is hint-free: AQE
    * broadcasts it while its measured size fits and falls back to a
    * shuffle join at scale (a hard hint here would OOM at 100x). */
  def segmentEnrichment(clean: DataFrame, customer: DataFrame): DataFrame =
    clean
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        clean("user_id") === col("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("unique_users"),
        (sum(col("value_cents")) / lit(100.0)).as("total_value"))

  /** A9 two-key variant (artist_gender.py:83-89: GROUP BY
    * first_discovered, gender): new users per (discovery date,
    * enrichment attribute). The user-grain aggregate and the customer
    * dim are both SF-proportional, so the enrichment join is hint-free
    * (AQE broadcasts while the dim measures small, shuffles at scale). */
  def discoveryBySegment(clean: DataFrame, customer: DataFrame): DataFrame =
    clean.groupBy(col("user_id"))
      .agg(min(col("event_date")).as("first_seen"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"), "left")
      .groupBy(col("first_seen"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("new_users"))

  /** A11 (dashboard/main_page.py:62 pandas pivot): day-of-week x
    * time-period count matrix as a real groupBy().pivot() with pinned
    * column values (no extra pass to discover them). */
  def periodPivot(clean: DataFrame): DataFrame =
    clean.groupBy(col("pg_dow"), col("day_name"))
      .pivot("time_period", Seq("morning", "afternoon", "evening", "night"))
      .agg(count(lit(1)))
      .select(col("pg_dow"), col("day_name"),
        coalesce(col("morning"), lit(0L)).as("morning"),
        coalesce(col("afternoon"), lit(0L)).as("afternoon"),
        coalesce(col("evening"), lit(0L)).as("evening"),
        coalesce(col("night"), lit(0L)).as("night"))

  /** A2 superset: ROLLUP over (day_name, time_period) — per-period
    * rows, per-day subtotals, and the grand total from ONE pass (an
    * Expand + a single shuffle), the idiomatic form of the reference's
    * two-level re-aggregation (main_ratio.py:26-58). Rollup's NULL
    * group markers surface as 'ALL' (both columns are non-null after
    * clean, so the marker is unambiguous and comparator-sortable). */
  def periodRollup(clean: DataFrame): DataFrame =
    clean.rollup(col("day_name"), col("time_period"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("value_cents")) / lit(100.0)).as("total_value"))
      .select(
        coalesce(col("day_name"), lit("ALL")).as("day_name"),
        coalesce(col("time_period"), lit("ALL")).as("time_period"),
        col("n_events"), col("total_value"))

  /** A12/P4 (spotify_client.py:655-675): validation summary — record
    * count, quality-score stats from the exact integer x10 view, flag
    * counts, distinct entities. Single row. */
  def validationSummary(clean: DataFrame): DataFrame = {
    val scoreX10 = when(col("quality_flag") === "missing_type", 5L)
      .when(col("quality_flag") === "short_duration", 7L)
      .otherwise(10L)
    clean.agg(
        count(lit(1)).as("n_records"),
        sum(scoreX10).as("sx10"),
        min(col("quality_score")).as("min_quality"),
        max(col("quality_score")).as("max_quality"),
        count(when(col("quality_flag") =!= "", 1)).as("n_flagged"),
        countDistinct(col("user_id")).as("unique_users"),
        countDistinct(col("event_type")).as("unique_types"))
      .select(col("n_records"),
        (col("sx10").cast("double") / (col("n_records") * lit(10.0)))
          .as("avg_quality"),
        col("min_quality"), col("max_quality"), col("n_flagged"),
        col("unique_users"), col("unique_types"))
  }

  /** A11 (dashboard/track.py:136-144): sankey link weights — the
    * two-level pandas groupby building conversion-category ->
    * lifecycle-stage flows, folded into one engine-side aggregation
    * over the lifecycle output. */
  def sankeyLinks(clean: DataFrame): DataFrame =
    lifecycle(clean)
      .groupBy(col("conversion_category"), col("lifecycle_stage"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("total_events")).as("total_events"))

  /** Batch sessionization (the batch twin of
    * graft.streaming.Streams.sessionize): a session breaks where the
    * gap to the previous event exceeds gapMinutes; session ids are the
    * running count of breaks (lag + cumulative sum — two passes over
    * one user partitioning), then one aggregate per session. */
  def sessionize(clean: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapUs = gapMinutes * 60000000L
    clean
      .withColumn("prev_us", lag(unix_micros(col("ts").cast("timestamp")), 1)
        .over(byUser))
      .withColumn("is_break",
        when(col("prev_us").isNull ||
          unix_micros(col("ts").cast("timestamp")) - col("prev_us") > gapUs,
          1L).otherwise(0L))
      .withColumn("session_no", sum(col("is_break")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ts")).cast("timestamp").as("session_start"),
        max(col("ts")).cast("timestamp").as("session_end"),
        count(lit(1)).as("n_events"),
        (sum(col("value_cents")) / lit(100.0)).as("total_value"))
  }

  /** A11/pandas normalization (dashboard/main_page.py:216-256): per-day
    * hourly intensity min-max normalized against the day's own range —
    * the reference does this client-side in pandas; here it is a window
    * over the day partition. The ratio is a single division of exact
    * integer counts (max==min days surface 0). */
  def normalizedIntensity(clean: DataFrame): DataFrame = {
    val hourly = clean.groupBy(col("event_date"), col("event_hour"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_date"))
    hourly
      .withColumn("day_min", min(col("n_events")).over(w))
      .withColumn("day_max", max(col("n_events")).over(w))
      .select(col("event_date"), col("event_hour"), col("n_events"),
        when(col("day_max") === col("day_min"), 0.0)
          .otherwise((col("n_events") - col("day_min")).cast("double") /
            (col("day_max") - col("day_min")))
          .as("intensity"))
  }

  /** §2.9 watermark incremental: events strictly after (max(ts) - 7d),
    * the batch rendering of the reference's collected_at > last_sync
    * Mongo scan (daily_etl_pipeline.py:131-137). */
  def incrementalAfterWatermark(clean: DataFrame): DataFrame = {
    val wm = clean.agg((max(col("ts")) - expr("interval 7 days")).as("wm"))
    clean.crossJoin(broadcast(wm))
      .where(col("ts") > col("wm"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("value_cents")) / lit(100.0)).as("total_value"))
  }
}
