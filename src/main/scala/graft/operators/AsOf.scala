package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-preceding-match) join — the canonical "operator
  * Spark lacks" (SURVEY.md §2.3 notes the reference has none; a
  * training pipeline wants it for joining events to the latest catalog
  * snapshot / price / model version at event time).
  *
  * Implementation is the (a)-tier composition from §2.10's preference
  * order — built-ins, no custom physical operator needed: tag and
  * union both sides, sort each key partition by (time, side) with the
  * right side first on ties (as-of is inclusive), and carry the most
  * recent right-side payload forward with last_value(ignoreNulls) over
  * an unbounded-preceding window. Cost: ONE shuffle on the key, linear
  * scan per partition — no range-condition join (which Spark would
  * execute as a broadcast-nested-loop or a theta sort-merge, both
  * quadratic-ish at scale).
  *
  * The right side must be unique per (key, time) — pre-aggregate it
  * deterministically if it is not (see Suite's rel_asof_join).
  */
object AsOf {

  /** Left as-of join: every left row gets the right row with the
    * greatest rightTime <= leftTime for the same key (null payload when
    * none precedes it).
    *
    * @param valueCols right-side columns to carry onto left rows
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // SQL join semantics: a NULL key or NULL time on the right can
    // never match anything — drop them BEFORE the window, or
    // Window.partitionBy (which groups NULLs together) would carry
    // their payload onto NULL-key left rows, fabricating matches the
    // equi-join predicate forbids.
    val r = right
      .where(col(key).isNotNull && col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
    // align schemas: left rows carry null payloads, right rows carry
    // nulls for every left column
    val leftCols = left.columns
    // carry the ENTIRE right payload as one struct: per-column
    // last(ignoreNulls) would stitch fields from different right rows
    // whenever a payload column is legitimately null in the matched row
    val payloadT = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    val rightSel = leftCols.map { c =>
      if (c == key) col(key).cast(left.schema(key).dataType).as(c)
      else lit(null).cast(left.schema(c).dataType).as(c)
    } ++ Seq(struct(valueCols.map(col): _*).as("__payload"),
      col("__t"), col("__side"))
    val union = l
      .select((leftCols.map(col) ++
        Seq(lit(null).cast(payloadT).as("__payload"),
          col("__t"), col("__side"))): _*)
      .unionByName(r.select(rightSel: _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    union
      .withColumn("__payload",
        last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select((leftCols.map(col) ++
        valueCols.map(c => col(s"__payload.$c").as(c))): _*)
  }

  /** Interval (range) containment join: left rows matched to right
    * intervals [startCol, startCol + days) sharing the key. A direct
    * BETWEEN join is a theta join Spark plans as broadcast-nested-loop
    * or cartesian; instead each interval is exploded into the calendar
    * days it covers and the join becomes an equi-join on (key, day) —
    * the standard bucketed range join. Cost: |right| x days extra rows
    * (bounded, known) against a plain hash join, instead of
    * |left| x |right| comparisons. */
  def joinRange(left: DataFrame, right: DataFrame, key: String,
      leftDate: String, rightStart: String, days: Int,
      valueCols: Seq[String]): DataFrame = {
    // sequence() with a stop before start silently counts BACKWARD,
    // which would match days preceding the interval
    require(days > 0, s"joinRange: days must be positive, got $days")
    val exploded = right.select(
      (Seq(col(key), col(rightStart)) ++ valueCols.map(col)): _*)
      .withColumn(leftDate,
        explode(sequence(col(rightStart),
          date_add(col(rightStart), days - 1))))
    left.join(exploded, Seq(key, leftDate), "inner")
  }
}
