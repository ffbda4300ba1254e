package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for the 100 TB path. AQE's skew-join
  * split handles sort-merge skew at runtime; explicit salting is the
  * complement when one join key dominates so heavily that even split
  * partitions hot-spot, or when the engine must guarantee fan-out
  * regardless of runtime statistics.
  */
object Skew {

  /** Salted equi-join of a skewed big side against a small-but-not-
    * broadcastable side: the big side gets a salt in [0, buckets)
    * derived from a STABLE per-row id column, the small side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key now spreads over `buckets` reducers.
    * Result set is identical to `big.join(small, key)`.
    *
    * The salt must be deterministic under task retries: a
    * monotonically_increasing_id salt reassigns on map-task rerun, so a
    * fetch-failure recompute can land rows in reduce partitions other
    * reducers already fetched — silently duplicating or dropping rows
    * (the SPARK-23207 class of bug). Hence the explicit idCol. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      idCol: String, buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(col(idCol)), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for heavy-hitter group keys: partial
    * aggregate on (key, salt), then final on key. Spark's map-side
    * combine already does this per-task; the explicit salt phase adds
    * reducer-level spreading when a single key's partials exceed one
    * reducer (e.g. one event_type is 90% of a 100 TB fact). */
  def saltedCount(df: DataFrame, key: String, idCol: String,
      buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(idCol)), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
