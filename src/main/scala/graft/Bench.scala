package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries
  * (Suite entries flagged bench=true) on SPARK_GRAFT_SF_DIR and prints
  * ONE JSON line. Results are written to the `noop` sink so the whole
  * plan materializes — a bare count() would let Catalyst prune most of
  * the work and overstate throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val queries = Suite.all.filter(_.bench)
    // one warm-up pass so JIT/codegen/FS cache don't dominate the timings
    queries.foreach { q =>
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // drop DataFrame caches populated by the warm-up: a cached cube
    // would make the timed pass measure a cache scan, not the query
    spark.catalog.clearCache()
    // median of 3 in-process repeats per query: the driver's bench is
    // single-run and has produced uniform 1.3x swings between rounds
    // with no engine change behind them (r9 vs r10) — the median
    // suppresses one-off GC/JIT/page-cache outliers while staying one
    // JVM and one invocation; the raw repeats ride along so any
    // remaining swing is attributable from the artifact itself
    val Repeats = 3
    val results = queries.map { q =>
      val runs = (1 to Repeats).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try {
            q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9 // before cache teardown
        spark.catalog.clearCache()
        (elapsed, ok)
      }
      val median = runs.map(_._1).sorted.apply(Repeats / 2)
      (q.name, median, runs.forall(_._2), runs.map(_._1))
    }
    val good = results.filter(_._3)
    val qs = good.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val reps = good.map { case (k, _, _, rs) =>
      "\"" + k + "\":" + rs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    // a crashing query must make the metric WORSE, not quietly shrink
    // it: each failure contributes a 600s penalty to the total
    val total = good.map(_._2).sum + results.count(!_._3) * 600.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"repeats":$reps,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // sbt interleaves its own logging with stdout, which has broken the
    // driver's JSON scrape before ("parsed": null in BENCH_r09) — also
    // write the line to a well-known file so parsing never depends on
    // log scraping
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
