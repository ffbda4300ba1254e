package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the engine: local[cpus], UTC, shuffle
  * parallelism = cores (not the 200 default — right-sized for the
  * local harness; on a real cluster this is cluster-sized or left to
  * AQE coalescing), AQE on, and the graft Catalyst extensions
  * installed (custom expressions, see [[graft.plans.GraftExtensions]]).
  */
object GraftSession {
  def create(cpus: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
