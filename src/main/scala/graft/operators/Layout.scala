package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout optimization — the Z-order (Morton)
  * clustering a 100 TB table wants when queries prune on MORE THAN ONE
  * column: a single-column sort gives perfect min/max pruning on that
  * column and none on any other, while sorting by the interleaved-bit
  * Z-value clusters every file in ALL interleaved dimensions at once
  * (each contiguous Z range is a small hyper-rectangle of the key
  * space), so per-file column statistics prune scans on either
  * predicate. This is the same layout idea behind Delta/Iceberg
  * OPTIMIZE ZORDER, expressed as a plain column expression + a
  * range-partitioned sorted write — no table format required.
  */
object Layout {

  /** Morton/Z-value of two keys confined to `bits` bits each: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. Inputs are MASKED
    * to `bits` bits (documented truncation — callers map their domain
    * into the grid first). Negative inputs are well-defined: the mask
    * keeps the two's-complement low bits, which equals the
    * mathematical (always non-negative) value mod 2^bits — the same
    * normalization [[zValueSql]] spells out, so both forms agree on
    * EVERY long input. Pure shift/and/or arithmetic: stays inside
    * whole-stage codegen, no UDF. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      val aBit = shiftleft(shiftrightunsigned(am, i).bitwiseAND(lit(1L)),
        2 * i)
      val bBit = shiftleft(shiftrightunsigned(bm, i).bitwiseAND(lit(1L)),
        2 * i + 1)
      aBit.bitwiseOR(bBit)
    }.reduce(_ bitwiseOR _)
  }

  /** The SAME interleave as [[zValue]] rendered as engine-portable
    * ANSI SQL, generated from one loop so the Spark expression and a
    * DuckDB oracle cannot drift. Two portability traps are handled
    * explicitly: (1) SQL `%` is sign-preserving (DuckDB and Spark
    * both return -5 for `-5 % 65536`) while [[zValue]]'s bit mask
    * keeps the non-negative two's-complement low bits, so the input
    * is normalized `((x % M) + M) % M` — the mathematical mod that
    * matches the mask for every long; (2) bit i is extracted with
    * mod-and-compare (`(x % 2^(i+1)) >= 2^i`) instead of integer
    * division, whose operator differs per engine (`//` is DuckDB-only,
    * `div` is Spark-only). */
  def zValueSql(a: String, b: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val m = 1L << bits
    def norm(x: String) = s"((($x) % $m + $m) % $m)"
    val terms = (0 until bits).flatMap { i =>
      val p = 1L << i
      Seq(
        s"(CASE WHEN ${norm(a)} % ${p * 2} >= $p " +
          s"THEN ${1L << (2 * i)} ELSE 0 END)",
        s"(CASE WHEN ${norm(b)} % ${p * 2} >= $p " +
          s"THEN ${1L << (2 * i + 1)} ELSE 0 END)")
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

  /** Z-order-clustered write: range-partition on the Z-value into
    * `nFiles` contiguous Z ranges, sort within each, and write — every
    * output file then covers a small rectangle of the (a, b) key
    * space, so min/max file statistics prune on EITHER column. The
    * helper column is dropped from the written schema. */
  def zOrderWrite(df: DataFrame, colA: String, colB: String,
      path: String, nFiles: Int, bits: Int = 16): Unit = {
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
