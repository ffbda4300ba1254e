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
  def entry(spark: SparkSession): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    StarSchema.dailyStats(
      StarSchema.clean(Tables(spark, "/root/testdata/sf0.001").events))
  }

  /** One entry per implemented operator from SURVEY.md §2. Each run
    * first registers the engine's custom expressions into the caller's
    * session, so any host session works (not just GraftSession). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Suite.queries.map { case (name, fn) =>
      name -> { (s: SparkSession, d: String) =>
        graft.plans.GraftFunctions.register(s)
        fn(s, d)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Suite.oracleSql
}
