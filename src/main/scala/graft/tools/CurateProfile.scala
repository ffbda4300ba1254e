package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiling main for the curation-pipeline breakdown: where
  * do text_curate_e2e's ~60 and text_curate_semdedup's ~82 jobs go,
  * stage by stage, at bench scale? Uses curateChain's pin hook as the
  * stage boundary — each pin is already an eager action, so the job
  * counter snapshot between pins attributes every job to the stage
  * that ran it. Not part of the library surface. */
object CurateProfile {
  private final class Jobs extends org.apache.spark.scheduler.SparkListener {
    val started = new AtomicLong
    val ended = new AtomicLong
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      started.incrementAndGet(); ()
    }
    override def onJobEnd(
        j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      ended.incrementAndGet(); ()
    }
    def quiesce(): Long = {
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var last = -1L
      while (System.nanoTime() < deadline &&
        { val now = started.get() + ended.get()
          val still = started.get() == ended.get() && now == last
          last = now; !still }) Thread.sleep(20)
      started.get()
    }
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{EmbeddingOps, TextOps}
    import graft.operators.Stage.PinOps
    val jobs = new Jobs
    spark.sparkContext.addSparkListener(jobs)

    def fixture(): DataFrame = graft.SuiteMLShared.htmlFixture(
      graft.Tables(spark, d).documents.toDF())

    var lastJobs = 0L
    var lastT = System.nanoTime()
    def mark(tag: String): Unit = {
      val j = jobs.quiesce()
      val t = System.nanoTime()
      println(f"PROFILE $tag%-22s jobs=${j - lastJobs}%3d " +
        f"sec=${(t - lastT) / 1e9}%7.3f")
      lastJobs = j; lastT = t
    }

    // warm-up (JIT, codegen, FS cache)
    TextOps.curate(fixture()).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    jobs.quiesce()

    println("== text_curate_e2e breakdown ==")
    lastJobs = jobs.quiesce(); lastT = System.nanoTime()
    var stage = 0
    val chain = TextOps.curateChain(fixture(), 8, 3950L, 100000L,
      pin = df => {
        val p = df.pinned
        stage += 1
        mark(s"stage_$stage")
        p
      })
    mark("chain_tail")
    TextOps.seqPack(chain.last._2, 512L, 200L)
      .write.format("noop").mode("overwrite").save()
    mark("seq_pack")

    println("== text_curate_semdedup front gate ==")
    val emb = graft.Tables(spark, d).embeddings.toDF()
    lastJobs = jobs.quiesce(); lastT = System.nanoTime()
    val dropped = EmbeddingOps.semanticDedup(emb, threshold = 0.45)
      .select(col("vec_b").as("doc_id")).distinct()
    dropped.write.format("noop").mode("overwrite").save()
    mark("semantic_dedup")
    spark.stop()
  }
}
