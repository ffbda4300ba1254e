package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries
  * (Suite entries flagged bench=true) on SPARK_GRAFT_SF_DIR and prints
  * ONE JSON line. Results are written to the `noop` sink so the whole
  * plan materializes — a bare count() would let Catalyst prune most of
  * the work and overstate throughput.
  */
object Bench {

  /** Deterministic plan-shape metrics per bench entry: job count,
    * stage count, and total shuffle rows/bytes. Wall-clock seconds
    * drift with the machine; these change only when the PLAN changes,
    * so a regression is attributable from the artifact alone without
    * reconciling two environments' clocks. Captured from the LAST
    * timed repeat (identical across repeats when the plan is
    * deterministic; AQE is on, so byte totals can wobble a few
    * percent — rows and counts must not). */
  private final class PlanMetrics
      extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    private val ended = new AtomicLong
    val jobs = new AtomicLong // doubles as the started-count quiesce() settles against
    val stages = new AtomicLong
    val shReadRows = new AtomicLong
    val shWriteRows = new AtomicLong
    val shReadBytes = new AtomicLong
    val shWriteBytes = new AtomicLong
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); ()
    }
    override def onJobEnd(
        j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      ended.incrementAndGet(); ()
    }
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted)
        : Unit = {
      stages.incrementAndGet()
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shReadRows.addAndGet(m.shuffleReadMetrics.recordsRead)
        shWriteRows.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        shReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
    /** Listener events deliver asynchronously; wait until every
      * started job has ended and the counters sit still — the bench
      * runs strictly sequentially, so quiet == complete. Returns
      * whether the counters actually settled: a false means the 15 s
      * deadline expired with jobs still draining, so late events can
      * land AFTER the next reset() and contaminate the NEXT repeat's
      * plan metrics — the caller stamps that into the artifact
      * ("settled": false) so a contaminated plan row is
      * distinguishable from a real plan change. */
    def quiesce(): Boolean = {
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var lastSeen = -1L
      var settled = false
      while (System.nanoTime() < deadline && {
        val now = jobs.get() + ended.get() + stages.get()
        settled = jobs.get() == ended.get() && now == lastSeen
        lastSeen = now
        !settled
      }) Thread.sleep(50)
      settled
    }
    def reset(): Unit = Seq(ended, jobs, stages, shReadRows,
      shWriteRows, shReadBytes, shWriteBytes).foreach(_.set(0))
    def json(settled: Boolean): String =
      s"""{"jobs":${jobs.get()},"stages":${stages.get()},""" +
        s""""sh_read_rows":${shReadRows.get()},""" +
        s""""sh_write_rows":${shWriteRows.get()},""" +
        s""""sh_read_bytes":${shReadBytes.get()},""" +
        s""""sh_write_bytes":${shWriteBytes.get()},""" +
        s""""settled":$settled}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new PlanMetrics
    spark.sparkContext.addSparkListener(metrics)
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
      var plan = "{}"
      val runs = (1 to Repeats).map { _ =>
        // an unsettled PRE-quiesce means the previous entry's jobs may
        // still drain into this repeat's counters — stamp both ends
        val preSettled = metrics.quiesce(); metrics.reset()
        val t0 = System.nanoTime()
        val ok =
          try {
            q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9 // before cache teardown
        // plan-shape capture is outside the timed window: quiesce
        // costs a settle poll, never query work
        val postSettled = metrics.quiesce()
        if (ok) plan = metrics.json(preSettled && postSettled)
        spark.catalog.clearCache()
        (elapsed, ok)
      }
      val median = runs.map(_._1).sorted.apply(Repeats / 2)
      (q.name, median, runs.forall(_._2), runs.map(_._1), plan)
    }
    // Maintenance rows: the staged-swap machinery (index + fold-state
    // compaction) served no bench row, so a regression in the rewrite
    // paths was invisible to the driver loop. Each repeat rebuilds its
    // fixture UNTIMED (a 2-segment index / 2-generation state with a
    // tombstoned slice), then times ONE maintenance call — the
    // tombstone-applying rewrite + generation swap. Kept OUT of the
    // headline total so query-vs-anchor comparisons stay stable.
    import org.apache.spark.sql.functions.col
    // each repeat deletes its fixture tree after the timed call —
    // three repeats of three fixtures at bench scale otherwise leave
    // gigabytes of dead index trees (doubled again by the retention
    // grace keeping each compaction's replaced tree), and the
    // accumulated IO pressure bleeds into later repeats' timings
    val fixtureDirs = scala.collection.mutable.ArrayBuffer[String]()
    def tempFixtureDir(tag: String): java.nio.file.Path = {
      val d = java.nio.file.Files.createTempDirectory(tag)
      fixtureDirs += d.toString
      d
    }
    def dropFixtures(): Unit = {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      fixtureDirs.foreach(p => rm(new java.io.File(p)))
      fixtureDirs.clear()
    }
    val maintFixtures: Seq[(String, () => (() => Unit))] = Seq(
      ("maint_index_compact", () => {
        val root = tempFixtureDir("graft_bench_mhidx")
          .resolve("idx").toString
        val docs = Tables(spark, sfDir).documents
        graft.operators.TextOps.minhashIndexWrite(
          docs.where(col("doc_id") % 2 === 0), root)
        graft.operators.TextOps.minhashIndexAppend(
          docs.where(col("doc_id") % 2 =!= 0), root)
        graft.operators.TextOps.minhashIndexDelete(spark, root,
          docs.where(col("doc_id") % 7 === 0).select(col("doc_id")))
        () => { graft.operators.TextOps.minhashIndexCompact(spark, root); () }
      }),
      ("maint_state_compact", () => {
        val streamDir = tempFixtureDir("graft_bench_st_in")
        val ckpt = tempFixtureDir("graft_bench_st_ck").toString
        val statePath = tempFixtureDir("graft_bench_st")
          .resolve("st").toString
        val docs = Tables(spark, sfDir).documents
        docs.where(col("doc_id") % 2 === 0).coalesce(1)
          .write.mode("append").parquet(streamDir.toString)
        docs.where(col("doc_id") % 2 =!= 0).coalesce(1)
          .write.mode("append").parquet(streamDir.toString)
        val q = graft.streaming.Streams.minhashSink(
            spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(streamDir.toString),
            statePath, ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(600000)
        graft.streaming.Streams.stateDelete(spark, statePath,
          docs.where(col("doc_id") % 7 === 0).select(col("doc_id")))
        () => { graft.streaming.Streams.compactState(spark, statePath); () }
      }),
      // the shard-merge surface: stitching two bench-scale minhash
      // shard roots must stay O(segments) DRIVER-SIDE METADATA — its
      // plan anchor is ZERO jobs / zero shuffle (the minhash family
      // has no params to validate, so the timed call plans nothing);
      // any Spark job appearing here means data started rewriting
      ("maint_index_merge", () => {
        val parent = tempFixtureDir("graft_bench_mg")
        val docs = Tables(spark, sfDir).documents
        val shards = (0 until 2).map { i =>
          val p = parent.resolve(s"shard$i").toString
          graft.operators.TextOps.minhashIndexWrite(
            docs.where(col("doc_id") % 2 === i), p)
          p
        }
        () => {
          graft.operators.TextOps.minhashIndexMerge(spark, shards,
            parent.resolve("merged").toString)
          ()
        }
      }),
      // size-tiered maintenance: the tail compaction's whole point is
      // O(tail) IO — the fixture is one BIG seed segment (70% of the
      // corpus, doc_id % 10 < 7) plus three 10% appended segments,
      // and the timed call merges ONLY the three small ones: it reads
      // 30% of the corpus, ~3x headroom against maint_index_compact's
      // full-rewrite anchor (5 970 vs 16 801 shuffle rows in
      // BASELINE.md). Creeping toward the full-rewrite number means
      // the tail door started reading the seed
      ("maint_tail_compact", () => {
        val root = tempFixtureDir("graft_bench_mhtail")
          .resolve("idx").toString
        val docs = Tables(spark, sfDir).documents
        graft.operators.TextOps.minhashIndexWrite(
          docs.where(col("doc_id") % 10 < 7), root)
        (0 until 3).foreach(i =>
          graft.operators.TextOps.minhashIndexAppend(
            docs.where(col("doc_id") % 10 === 7 + i), root))
        () => {
          graft.operators.TextOps.minhashIndexCompactTail(spark, root,
            maxSegments = 2)
          ()
        }
      }),
      // the third maintenance surface: the BM25 compact is the most
      // intricate rewrite (postings consolidate AND the collection
      // totals recompute from surviving postings), so a regression
      // there deserves its own driver-visible row
      ("maint_bm25_compact", () => {
        val root = tempFixtureDir("graft_bench_bmidx")
          .resolve("idx").toString
        val docs = Tables(spark, sfDir).documents
        graft.operators.TextOps.bm25IndexWrite(
          docs.where(col("doc_id") % 2 === 0), root)
        graft.operators.TextOps.bm25IndexAppend(
          docs.where(col("doc_id") % 2 =!= 0), root)
        graft.operators.EmbeddingOps.indexDelete(spark, root,
          docs.where(col("doc_id") % 7 === 0).select(col("doc_id")),
          keyCol = "doc_id")
        () => { graft.operators.TextOps.bm25IndexCompact(spark, root); () }
      }))
    val maintResults = maintFixtures.map { case (name, mkFixture) =>
      var plan = "{}"
      val runs = (1 to Repeats).map { _ =>
        val opOrNull = try mkFixture() catch { case _: Throwable => null }
        // fixture jobs don't count
        val preSettled = metrics.quiesce(); metrics.reset()
        val t0 = System.nanoTime()
        val ok =
          try { if (opOrNull == null) false else { opOrNull(); true } }
          catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        val postSettled = metrics.quiesce()
        if (ok) plan = metrics.json(preSettled && postSettled)
        spark.catalog.clearCache()
        dropFixtures() // untimed: dead trees must not tax later runs
        (elapsed, ok)
      }
      (name, runs.map(_._1).sorted.apply(Repeats / 2),
        runs.forall(_._2), runs.map(_._1), plan)
    }
    val good = results.filter(_._3)
    val qs = good.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val reps = good.map { case (k, _, _, rs, _) =>
      "\"" + k + "\":" + rs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = (results.filterNot(_._3) ++ maintResults.filterNot(_._3))
      .map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val maintGood = maintResults.filter(_._3)
    val maint = maintGood.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val maintReps = maintGood.map { case (k, _, _, rs, _) =>
      "\"" + k + "\":" + rs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // plan-shape metrics for every successful entry (queries and
    // maintenance alike): environment-independent regression anchors
    val plans = (good ++ maintGood).map { case (k, _, _, _, p) =>
      "\"" + k + "\":" + p
    }.mkString("{", ",", "}")
    // a crashing query must make the metric WORSE, not quietly shrink
    // it: each failure contributes a 600s penalty to the total
    val total = good.map(_._2).sum + results.count(!_._3) * 600.0 +
      maintResults.count(!_._3) * 600.0
    // environment self-adjudication: two cheap, code-stable CONTROL
    // rows (untouched since r7) are compared against their clean-run
    // anchors (BASELINE.md r16) inside the artifact itself, so a
    // drifted run is labeled at the source instead of in a judging
    // session. ok = every control within 2x of its anchor — the same
    // band the repo's binding regression rule uses. Anchors are for
    // the driver's sf0.1 scale; other SF dirs skip the stamp (ok
    // stays true with an explicit "scale" note).
    val controlAnchors = Map("sim_ann_topk" -> 0.60, "an_heatmap" -> 0.27)
    val atAnchorScale = sfDir.endsWith("sf0.1")
    val controls = good.collect {
      case (k, v, _, _, _) if atAnchorScale && controlAnchors.contains(k) =>
        (k, v, controlAnchors(k), v / controlAnchors(k))
    }
    val envOk = controls.forall(_._4 <= 2.0)
    val controlsJson = controls.map { case (k, v, a, r) =>
      "\"" + k + "\":{\"sec\":" + v + ",\"anchor\":" + a +
        ",\"ratio\":" + (math.round(r * 100) / 100.0) + "}"
    }.mkString("{", ",", "}")
    val env = s"""{"ok":$envOk,"controls":$controlsJson""" +
      (if (atAnchorScale) "}" else ""","scale":"non-anchor sf — controls not comparable"}""")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"repeats":$reps,"maintenance":$maint,"maint_repeats":$maintReps,"plan":$plans,"environment":$env,"failed":$failed,"sf":"$sfDir"}"""
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
