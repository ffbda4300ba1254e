package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.StarSchema

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in [[Suite]]; this object is the thin adapter the
  * driver invokes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: the full ETL spine (clean -> star -> daily stats). */
  def entry(spark: SparkSession): DataFrame =
    StarSchema.dailyStats(
      StarSchema.clean(Tables(spark, "/root/testdata/sf0.001").events))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Suite.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Suite.oracleSql
}
