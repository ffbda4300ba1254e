package graft.operators

import graft.operators.Stage.PinOps

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter pruned joins — the semi-join pushdown a 100 TB join
  * wants when the big side's rows mostly DON'T match: build a compact
  * membership sketch of the small side's join keys, filter the big
  * side with it BEFORE the join's shuffle, and let the join itself
  * remove the sketch's false positives. The shuffle then moves only
  * ~(matching + fpp * non-matching) rows instead of the whole fact
  * table. This is the hand-rolled form of Spark's own runtime
  * row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.*`),
  * exposed as an operator so a pipeline can apply it where the
  * optimizer's heuristics would not (e.g. the small side is a computed
  * frame with no stats, or the filter should be reused across several
  * joins of one job).
  *
  * Correctness contract: a bloom filter has NO false negatives, so the
  * pruned join equals the unpruned join row-for-row — which is exactly
  * what the driver oracle checks (`rel_bloom_prune_join`).
  */
object BloomJoin {

  /** Both the build (`putLong`) and the probe (`mightContainLong`)
    * hash the key as a widened long, so only integral key columns keep
    * the no-false-negative contract — a string key would hash as bytes
    * on the build side but as a (possibly null) long cast on the probe
    * side, silently dropping matching rows. Refuse anything else. */
  private def requireIntegralKey(df: DataFrame, key: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    // resolve with the SESSION's resolver (case-insensitive by
    // default) — a case-sensitive schema(key) lookup would reject key
    // spellings that col(key)/stat.bloomFilter themselves resolve
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val field = df.schema.find(f => resolver(f.name, key))
      .getOrElse(throw new IllegalArgumentException(
        s"bloom join key column $key does not exist in " +
          df.schema.fieldNames.mkString("[", ", ", "]")))
    require(Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(field.dataType),
      s"bloom join keys must be integral, got ${field.dataType.sql} " +
        s"for column $key")
  }

  /** Serialized bloom filter of `small`'s `key` column (integral keys,
    * hashed as longs). The build is a distributed tree aggregate (each
    * partition fills a local sketch, merged associatively); only the
    * fixed-size sketch (~1.2 MB per million keys at 1 % fpp) ever
    * reaches the driver — the keys themselves never move.
    * `expectedItems` sizes the bit array; passing an estimate from
    * upstream metadata avoids the extra counting job. */
  def buildFilter(small: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0,
      s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    requireIntegralKey(small, key)
    val bf = small.stat.bloomFilter(key, expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `big` restricted to rows whose `key` might be in the filter —
    * the pre-shuffle prune. The probe is the codegen'd
    * [[graft.plans.BloomMightContainI64]] expression (registered as
    * `bloom_might_contain`), so it runs inside the scan's
    * whole-stage-codegen'd filter. The key is cast to long — the
    * sketch hashes every integral type through `putLong`, so the cast
    * is exactly the build side's own widening. */
  def prune(big: DataFrame, key: String, filter: Array[Byte]): DataFrame = {
    requireIntegralKey(big, key)
    big.where(call_function("bloom_might_contain",
      col(key).cast("long"), lit(filter)))
  }

  /** Inner equi-join of `big` and `small` with the big side
    * bloom-pruned first. The small side is pinned (Stage.pinned): it is
    * evaluated ONCE and the same materialization feeds the sizing
    * count, the sketch build, and the join — without it, a
    * recomputed-per-job small frame costs three evaluations and, if
    * its evaluation were nondeterministic, could even put different
    * keys in the filter than in the join (real false negatives). The
    * sizing count is a plain count(): duplicates only oversize the bit
    * array, which strictly LOWERS fpp — cheaper than a distinct
    * shuffle and errs in the safe direction. */
  def bloomPrunedJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      fpp: Double = 0.01): DataFrame = {
    val s = small.pinned
    val n = math.max(1L, s.count())
    val filter = buildFilter(s, smallKey, n, fpp)
    // the join keys are resolved against their OWN frames — a bare
    // col(bigKey) === col(smallKey) resolves against the combined
    // output and throws AMBIGUOUS_REFERENCE whenever both sides name
    // the key identically (the common case for natural keys). When
    // the names DO collide, the small side's copy is dropped from the
    // output as well: keeping both would just defer the same
    // ambiguity to the caller's first select/groupBy by that name
    // (the values are equal by the join predicate — nothing is lost).
    val pruned = prune(big, bigKey, filter)
    val joined = pruned.join(s, pruned(bigKey) === s(smallKey))
    // name equality follows the SESSION's resolver (case-insensitive
    // by default, like requireIntegralKey's lookup): "CUSTKEY" vs
    // "custkey" is the same downstream ambiguity as an exact match
    val resolver = big.sparkSession.sessionState.analyzer.resolver
    if (resolver(bigKey, smallKey)) joined.drop(s(smallKey)) else joined
  }
}
