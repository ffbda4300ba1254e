package graft.operators

import graft.operators.Stage.PinOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline safety rails: declarative data-quality expectations and
  * snapshot reconciliation — the checks a production load runs before
  * publishing a table (the Deequ / Great Expectations class, reduced
  * to its Spark-native core: plain boolean columns and one aggregate
  * pass, no framework).
  */
object Checks {

  /** Violation counter for one rule: rows where the rule is false OR
    * undecidable (NULL) count as violations. Shared by [[expect]] and
    * [[Warehouse.publishAudited]]'s fused audit+count pass. */
  private[operators] def violationAgg(rule: Column): Column =
    sum(when(coalesce(rule, lit(false)), 0L).otherwise(1L))

  private[operators] def validateRuleNames(names: Seq[String]): Unit = {
    require(names.nonEmpty, "expect needs at least one rule")
    require(names.forall(n => n.nonEmpty && !n.contains("`")),
      "rule names must be non-empty and must not contain backticks")
    // case-INsensitive duplicate check: the aggregated columns resolve
    // under the session's (default case-insensitive) resolver, where
    // "A" and "a" would be ambiguous
    val lc = names.map(_.toLowerCase(java.util.Locale.ROOT))
    require(lc.distinct.size == lc.size,
      s"duplicate rule name (case-insensitive): ${lc.diff(
        lc.distinct).distinct.mkString(", ")}")
  }

  /** Evaluate named boolean rules over a frame in ONE aggregate pass
    * (conditional sums — never a job per rule): one output row per
    * rule with its violation count and pass flag. A rule evaluating
    * to NULL on a row counts as a violation of that row (null-hostile
    * by design: an expectation that cannot be decided is not met).
    * At 100 TB this is a single map-side-combined scan regardless of
    * how many rules the gate carries. */
  def expect(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    validateRuleNames(rules.map(_._1))
    val aggs = rules.map { case (name, rule) => violationAgg(rule).as(name) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // aggregate columns are re-referenced BACKTICK-QUOTED: a rule
    // named "value.positive" is a legal alias but a bare col() on it
    // would parse the dot as a struct-field access
    one.select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"),
          coalesce(col(s"`$name`"), lit(0L)).as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.rule").as("rule"),
        col("r.n_violations").as("n_violations"),
        (col("r.n_violations") === 0L).as("passed"))
  }

  /** Snapshot reconciliation: per-key diff of two table versions by a
    * caller-supplied FINGERPRINT column (a canonical content hash —
    * the caller picks engine-stable canonical forms, e.g. integer
    * cents rather than raw doubles). Emits one row per difference
    * class: added (key only in `next`), removed (key only in `prev`),
    * changed (key in both, fingerprints differ), unchanged.
    *
    * Contract hardening: each side is pre-aggregated per key (min
    * fingerprint as the deterministic canonical pick), so duplicate
    * keys count ONCE instead of fanning out the join; presence is
    * tracked by explicit flags, not fingerprint nullness, so a NULL
    * fingerprint (e.g. a hash of an all-NULL payload) still
    * classifies correctly — two NULL fingerprints compare as
    * unchanged (null-safe equality). The diff is one full-outer join
    * on the key of two compact (key, fingerprint) aggregates — at
    * 100 TB a key shuffle of fingerprints, never the row payloads. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, key: String,
      fingerprint: Column): DataFrame = {
    def side(df: DataFrame, fpName: String, flagName: String) =
      df.select(col(key).as("k"), fingerprint.as("fp"))
        .groupBy(col("k")).agg(min(col("fp")).as(fpName))
        .withColumn(flagName, lit(true))
    val p = side(prev, "fp_prev", "in_prev")
    val n = side(next, "fp_next", "in_next")
    val status = when(coalesce(col("in_prev"), lit(false)) === false,
        "added")
      .when(coalesce(col("in_next"), lit(false)) === false, "removed")
      .when(col("fp_prev") <=> col("fp_next"), "unchanged")
      .otherwise("changed")
    p.join(n, Seq("k"), "full_outer")
      .select(status.as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** One-row-per-column profiling card — the artifact a pipeline
    * stamps per ingested table/partition (the pandas-profiling /
    * Deequ analyzer class, Spark-native): row count, null count,
    * EXACT distinct count, and min/max per profiled column. Min/max
    * are computed on the NATIVE type (so numeric ordering holds) and
    * surfaced as strings for the uniform card schema. ONE aggregate
    * job: Spark plans the multi-column distinct aggregates via
    * Expand — the scan is read once and the shuffle carries
    * |cols| x |rows| expanded KEYS, partially aggregated map-side;
    * profile a deliberate column list, not `df.columns`, at corpus
    * scale. */
  def profileCard(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.distinct.size == cols.size,
      "profile columns must be non-empty and distinct")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /** Exact numeric profile — the [[profileCard]] companion for
    * measure columns: per column, non-null count, null count, and
    * EXACT cents-quantized min/max/median. Shape is
    * [[EmbeddingOps.dimStats]]'s value-histogram selection: melt to
    * (column, quantized value), aggregate to one row per DISTINCT
    * value (map-side combined), then select the lower median off the
    * cumulative histogram — the windows walk one row per distinct
    * value, never a per-column corpus sort. Cents quantization
    * (round(x*100), half-away-from-zero on the positive domain both
    * engines share) keeps every statistic an exact integer — the
    * determinism discipline every oracle row in this engine rides. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.distinct.size == cols.size,
      "profile columns must be non-empty and distinct")
    val total = broadcast(df.agg(count(lit(1)).as("total")))
    val hist = df.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        round(col(c).cast("double") * 100).cast("long").as("v")))
        : _*)).as("kv"))
      .select(col("kv.*"))
      .where(col("v").isNotNull)
      .groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .pinned // stats branch + median branch, one histogram
    val n = hist.groupBy(col("col_name"))
      .agg(sum(col("cnt")).as("n_vals"), min(col("v")).as("min_c"),
        max(col("v")).as("max_c"))
    val w = Window.partitionBy(col("col_name")).orderBy(col("v"))
    val med = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .join(n.select(col("col_name"), col("n_vals")), Seq("col_name"))
      .where(col("cum") >= expr("(n_vals + 1) div 2"))
      .groupBy(col("col_name")).agg(min(col("v")).as("median_c"))
    // a fully-NULL column contributes NO histogram rows — outer-join
    // the stats back onto the LITERAL column list so it still emits a
    // row (n_vals=0, n_nulls=total, NULL extremes): the alarming
    // shape, not a silently missing one. The literal frame is
    // |cols| rows; the joined stats side is one row per column.
    val names = df.sparkSession
      .createDataset(cols)(org.apache.spark.sql.Encoders.STRING)
      .toDF("col_name")
    n.join(med, Seq("col_name")).join(names, Seq("col_name"), "right")
      .crossJoin(total)
      .select(col("col_name"),
        coalesce(col("n_vals"), lit(0L)).as("n_vals"),
        (col("total") - coalesce(col("n_vals"), lit(0L)))
          .as("n_nulls"),
        col("min_c"), col("max_c"), col("median_c"))
  }

  /** Exact top-`k` most frequent values per profiled column (heavy
    * hitters) — the companion card to [[profileCard]] for the
    * categorical columns a skew-aware pipeline watches (join keys,
    * partition keys, enum fields). Values surface as strings for the
    * uniform schema; NULLs are excluded (the null MASS is
    * [[profileCard]]'s n_nulls). Shape: melt to (column, value) and
    * aggregate — the explode multiplies the scan by |cols| but the
    * count is map-side combined, so the shuffle carries one row per
    * DISTINCT (column, value), never per input row; the per-column
    * top-k window rides that bounded frame. Ties break by value, the
    * engine-wide total-order rule. */
  def heavyHitters(df: DataFrame, cols: Seq[String],
      k: Int = 5): DataFrame = {
    require(cols.nonEmpty && cols.distinct.size == cols.size,
      "profile columns must be non-empty and distinct")
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name"))
      .orderBy(col("cnt").desc, col("value").asc)
    df.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(c).cast("string").as("value"))): _*)).as("kv"))
      .select(col("kv.*"))
      .where(col("value").isNotNull)
      .groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= k)
  }
}
