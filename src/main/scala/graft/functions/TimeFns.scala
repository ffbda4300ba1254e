package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-derivation column functions (reference: P2,
  * dags/spotify/daily_etl_pipeline.py:241-258).
  *
  * The reference runs on PostgreSQL where EXTRACT(dow) has Sunday=0;
  * Spark's dayofweek() has Sunday=1, so [[pgDow]] shifts by one. All
  * helpers are pure Catalyst column expressions (codegen-friendly, no
  * UDFs).
  */
object TimeFns {

  /** PostgreSQL-style day of week: Sunday=0 .. Saturday=6. */
  def pgDow(d: Column): Column = (dayofweek(d) - lit(1)).cast("int")

  /** Weekend = Sunday(0) or Saturday(6) (daily_etl_pipeline.py:252-254). */
  def isWeekend(d: Column): Column = pgDow(d).isin(0, 6)

  /** morning 6-11 / afternoon 12-17 / evening 18-23 / night else
    * (daily_etl_pipeline.py:246-251). */
  def timePeriod(hour: Column): Column =
    when(hour.between(6, 11), "morning")
      .when(hour.between(12, 17), "afternoon")
      .when(hour.between(18, 23), "evening")
      .otherwise("night")

  /** English day name, e.g. "Sunday" (matches DuckDB dayname()). */
  def dayName(d: Column): Column = date_format(d, "EEEE")

  /** Surrogate yyyymmdd integer date key (dim_dates pattern,
    * README.md:208). */
  def dateKey(d: Column): Column =
    (year(d) * lit(10000) + month(d) * lit(100) + dayofmonth(d)).cast("int")

  /** Epoch-week bucket relative to 2000-01-01
    * (dashboard/artist.py:28: (first_discovered - DATE '2000-01-01')/7). */
  def epochWeek(d: Column): Column =
    floor(datediff(d, to_date(lit("2000-01-01"))) / 7).cast("long")

  /** Exact integer cents of a 2-decimal double column. Sums of cents are
    * exact in both Spark and the DuckDB oracle, which keeps hash
    * comparisons deterministic (no float accumulation-order drift). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact decimal(20,2) view of a 2-decimal double column, for exact
    * distributed SUMs that are then surfaced as double. */
  def dec2(c: Column): Column = c.cast("decimal(20,2)")

  /** Exact decimal(20,4) of a product of two 2-decimal doubles (e.g.
    * price * (1 - discount)): the true value has <=4 decimals, so the
    * cast removes per-row FP noise before an exact decimal SUM. */
  def dec4(c: Column): Column = c.cast("decimal(20,4)")

  /** decimal(20,6) for triple products (price*(1-d)*(1+t)). */
  def dec6(c: Column): Column = c.cast("decimal(20,6)")

  /** Exact long view of an n-decimal double (round(x * 10^n)). Long
    * sums stay in whole-stage codegen (primitive adds), roughly 5x
    * faster than decimal aggregation; magnitude analysis: a group sum
    * overflows i64 only past ~10^14 rows x 10^4-unit values, so longs
    * are correct through warehouse scale — swap to [[dec4]]-style
    * decimals only for truly unbounded accumulations. */
  def longUnits(c: Column, decimals: Int): Column =
    round(c * math.pow(10, decimals).toLong).cast("long")
}
