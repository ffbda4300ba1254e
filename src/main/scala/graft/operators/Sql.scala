package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** S12 (dashboard/database_manager.py:92-107): the reference's entire
  * dashboard query API is "send a SQL string, get a frame back". The
  * Spark-native form: register the warehouse tables as temp views once,
  * then `spark.sql` — same contract, but the string compiles through
  * Catalyst with full pushdown/pruning instead of shipping to an
  * external database.
  */
object Sql {

  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register every testdata table as a temp view over its parquet. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    TableNames.foreach { n =>
      val df = n match {
        case "region" => t.region; case "nation" => t.nation
        case "customer" => t.customer; case "supplier" => t.supplier
        case "part" => t.part; case "orders" => t.orders
        case "lineitem" => t.lineitem; case "events" => t.events
        case "documents" => t.documents; case "embeddings" => t.embeddings
      }
      df.createOrReplaceTempView(n)
    }
  }

  /** Run a raw SQL query against the registered views. Custom engine
    * functions (dot_i64, top1_by_count) are registered first so raw SQL
    * can call them from any host session. */
  def run(spark: SparkSession, dir: String, query: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    registerViews(spark, dir)
    spark.sql(query)
  }

  /** Convenience view over "today's" listening (dwh.v_today_listening,
    * README.md:201) — anchored to the data's max date so it is
    * deterministic (SURVEY.md §7 risk #2: CURRENT_DATE-anchored queries
    * take the as-of date as a parameter). */
  def createTodayView(spark: SparkSession, dir: String): Unit = {
    registerViews(spark, dir)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW v_today_listening AS
        |SELECT * FROM events
        |WHERE CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)
        |""".stripMargin)
  }
}
