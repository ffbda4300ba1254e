package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
