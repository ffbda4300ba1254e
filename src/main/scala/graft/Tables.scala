package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed access to the driver-provided parquet tables (TESTDATA.md).
  *
  * `events` ships as parquet TIMESTAMP(NANOS) which Spark's vectorized
  * reader rejects; we read nanos as long (legacy conf) and down-convert
  * to microsecond TIMESTAMP_NTZ (truncating, same as DuckDB's ns->us
  * cast) so all downstream time logic matches the oracle bit-for-bit.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def p(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = p("region")
  def nation: DataFrame     = p("nation")
  def customer: DataFrame   = p("customer")
  def supplier: DataFrame   = p("supplier")
  def part: DataFrame       = p("part")
  def orders: DataFrame     = p("orders")
  def lineitem: DataFrame   = p("lineitem")
  def documents: DataFrame  = p("documents")
  def embeddings: DataFrame = p("embeddings")

  /** events with `ts` normalized to TIMESTAMP_NTZ (micros), whatever
    * the parquet encoding: TIMESTAMP(NANOS) is read nanos-as-long
    * (legacy conf) and truncated ns->us exactly like DuckDB's cast;
    * a native TIMESTAMP(MICROS) column (the generator switched to
    * this encoding) just re-types. Dispatch on the READ schema so the
    * engine keeps working against either vintage of the data. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = p("events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", ts)
  }

  /** Typed views (SURVEY.md §1.3) — the Dataset[T] API surface over
    * the same parquet tables. */
  object typed {
    import graft.model._

    def events: org.apache.spark.sql.Dataset[Event] = {
      import Tables.this.spark.implicits._
      Tables.this.events
        .withColumn("ts", col("ts").cast("timestamp")).as[Event]
    }

    def documents: org.apache.spark.sql.Dataset[Document] = {
      import Tables.this.spark.implicits._
      Tables.this.documents.as[Document]
    }

    def embeddings: org.apache.spark.sql.Dataset[Embedding] = {
      import Tables.this.spark.implicits._
      Tables.this.embeddings.as[Embedding]
    }
  }
}
