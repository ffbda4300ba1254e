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

  /** Evaluate named boolean rules over a frame in ONE aggregate pass
    * (conditional sums — never a job per rule): one output row per
    * rule with its violation count and pass flag. A rule evaluating
    * to NULL on a row counts as a violation of that row (null-hostile
    * by design: an expectation that cannot be decided is not met).
    * At 100 TB this is a single map-side-combined scan regardless of
    * how many rules the gate carries. */
  def expect(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expect needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule name: ${rules.map(_._1).diff(
        rules.map(_._1).distinct).distinct.mkString(", ")}")
    val aggs = rules.map { case (name, rule) =>
      sum(when(coalesce(rule, lit(false)), 0L).otherwise(1L)).as(name)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"),
          coalesce(col(name), lit(0L)).as("n_violations"))
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
    * changed (key in both, fingerprints differ), unchanged. The diff
    * is one full-outer join on the key of two (key, fingerprint)
    * projections — at 100 TB that is a key shuffle of two compact
    * frames, never the full row payloads. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, key: String,
      fingerprint: Column): DataFrame = {
    val p = prev.select(col(key).as("k"), fingerprint.as("fp_prev"))
    val n = next.select(col(key).as("k"), fingerprint.as("fp_next"))
    val status = when(col("fp_prev").isNull, "added")
      .when(col("fp_next").isNull, "removed")
      .when(col("fp_prev") === col("fp_next"), "unchanged")
      .otherwise("changed")
    p.join(n, Seq("k"), "full_outer")
      .select(status.as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_keys"))
  }
}
