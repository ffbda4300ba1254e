package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}

import graft.operators.{EmbeddingOps, TextOps}

/** Exact serving from the persisted MinHash index
  * ([[TextOps.nearDupServeExact]] over `_posts` posting sidecars):
  * recall-guaranteed batch-vs-stored lookups that must equal BRUTE
  * FORCE through every lifecycle door — build, append, delete, tail
  * and full compaction, merge, streamed ingestion — with the layout
  * self-described (plain/mixed chains refuse loudly). */
class ExactServeSpec extends SparkSpec {

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmpRoot(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_$tag").toString + "/ix"

  private val docs = Tables(SparkSpec.session, "/root/testdata/sf0.001")
    .documents

  /** Brute-force cross join: every (stored, batch) pair at
    * jaccard >= threshold over distinct raw-shingle sets. */
  private def bruteCross(stored: DataFrame, batch: DataFrame,
      threshold: Double): Seq[String] = {
    def sets(d: DataFrame) = TextOps.shingles(d)
      .select(col("doc_id"), col("s")).distinct()
    val dsa = sets(stored)
    val dsb = sets(batch)
    val sza = dsa.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val szb = dsb.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    dsa.as("a").join(dsb.as("b"), col("a.s") === col("b.s"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sza.select(col("doc_id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"))
      .join(szb.select(col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("doc_b"))
      .where(col("n_common") /
        (col("na") + col("nb") - col("n_common")).cast("double")
        >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
        col("nb"))
      .collect().map(_.toString).sorted.toSeq
  }

  private def servedExact(root: String, batch: DataFrame,
      threshold: Double = 0.7): Seq[String] =
    TextOps.nearDupServeExact(spark, root, batch, threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
        col("nb"))
      .collect().map(_.toString).sorted.toSeq

  test("exact serving equals brute force at several thresholds — " +
    "recall the banded serve cannot guarantee, machine-checked") {
    val stored = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val root = tmpRoot("exsrv")
    TextOps.minhashIndexWrite(stored, root, exact = true)
    Seq(0.5, 0.7, 0.9).foreach { t =>
      assert(servedExact(root, batch, t) == bruteCross(stored, batch, t),
        s"exact serve must equal brute force at t=$t")
    }
    assert(servedExact(root, batch, 0.7).nonEmpty,
      "the fixture slices contain qualifying pairs")
  }

  test("the candidate probe routes by answer size: the distributed " +
    "fallback serves the same rows as the broadcast fast path") {
    // the localPairLimit guard (the bm25TopKIndexedBatch discipline):
    // candidates are ANSWER-sized, so an unconditional broadcast is a
    // driver OOM waiting for one stop-shingle. localPairLimit = 1
    // forces the keyed fallback here; rows must be identical to the
    // default (broadcast) route and to brute force.
    val stored = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val root = tmpRoot("exroute")
    TextOps.minhashIndexWrite(stored, root, exact = true)
    def route(limit: Int): Seq[String] =
      TextOps.nearDupServeExact(spark, root, batch, 0.7,
          localPairLimit = limit)
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
          col("nb"))
        .collect().map(_.toString).sorted.toSeq
    val brute = bruteCross(stored, batch, 0.7)
    assert(brute.nonEmpty, "the fixture slices contain qualifying pairs")
    assert(route(Int.MaxValue) == brute, "broadcast route != brute force")
    assert(route(1) == brute, "distributed fallback != brute force")
  }

  test("containment serving equals brute force at several thresholds, " +
    "on both candidate routes, and masks tombstones") {
    // the decontamination shape served from the persisted index:
    // |B∩A| / |B| over (stored container A, batch contained B) —
    // recall unconditional via the same batch-prefix pigeonhole, the
    // size filter one-sided (a container 10x the contained doc still
    // qualifies where Jaccard goes blind)
    def bruteContain(stored: DataFrame, batch: DataFrame,
        threshold: Double): Seq[String] = {
      def sets(d: DataFrame) = TextOps.shingles(d)
        .select(col("doc_id"), col("s")).distinct()
      val dsa = sets(stored)
      val dsb = sets(batch)
      val sza = dsa.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val szb = dsb.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      dsa.as("a").join(dsb.as("b"), col("a.s") === col("b.s"))
        .groupBy(col("a.doc_id").as("doc_a"),
          col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_common"))
        .join(sza.select(col("doc_id").as("doc_a"), col("n").as("na")),
          Seq("doc_a"))
        .join(szb.select(col("doc_id").as("doc_b"), col("n").as("nb")),
          Seq("doc_b"))
        .where(col("n_common") / col("nb").cast("double") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
          col("nb"))
        .collect().map(_.toString).sorted.toSeq
    }
    val stored = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val root = tmpRoot("excont")
    TextOps.minhashIndexWrite(stored, root, exact = true)
    def serve(t: Double, limit: Int = 262144): Seq[String] =
      TextOps.containmentServeExact(spark, root, batch, t,
          localPairLimit = limit)
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
          col("nb"))
        .collect().map(_.toString).sorted.toSeq
    Seq(0.5, 0.9).foreach { t =>
      assert(serve(t) == bruteContain(stored, batch, t),
        s"containment serve must equal brute force at t=$t")
    }
    assert(serve(0.5).nonEmpty,
      "the fixture slices contain qualifying pairs")
    assert(serve(0.9, limit = 1) == bruteContain(stored, batch, 0.9),
      "the distributed fallback must serve the same rows")
    // tombstoned containers drop from the answer exactly
    TextOps.minhashIndexDelete(spark, root,
      stored.where(col("doc_id") % 3 === 0).select(col("doc_id")))
    assert(serve(0.9) ==
      bruteContain(stored.where(col("doc_id") % 3 =!= 0), batch, 0.9),
      "tombstones must mask containment serving exactly")
  }

  test("the posting-bucket balance report equals a recomputation " +
    "from the corpus — per (seg, pb), tombstone-aware") {
    import org.apache.spark.sql.functions.{count, expr, lit, max,
      pmod, struct, sum, xxhash64, broadcast}
    val stored = docs.where(col("doc_id") % 5 =!= 0)
    val root = tmpRoot("expstats")
    TextOps.minhashIndexWrite(stored.where(col("doc_id") % 2 === 0),
      root, exact = true)
    TextOps.minhashIndexAppend(stored.where(col("doc_id") % 2 =!= 0),
      root)
    TextOps.minhashIndexDelete(spark, root,
      stored.where(col("doc_id") % 3 === 0).select(col("doc_id")))
    val got = TextOps.minhashExactStats(spark, root)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty)
    // recompute from the RAW corpus: distinct shingle digests per
    // live doc (the tombstoned % 3 docs excluded), seg by the build
    // split, pb by the family formula
    val live = stored.where(col("doc_id") % 3 =!= 0)
    val posts = TextOps.shingles(live)
      .select(col("doc_id"), xxhash64(col("s")).as("h")).distinct()
      .withColumn("seg",
        expr("CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS INT)"))
      .withColumn("pb", pmod(col("h"), lit(64L)))
    val perBucket = posts.groupBy(col("seg"), col("pb"), col("h"))
      .agg(count(lit(1)).as("df"))
      .groupBy(col("seg"), col("pb"))
      .agg(sum(col("df")).as("n_posts"),
        count(lit(1)).as("n_digests"),
        max(struct(col("df"), col("h"))).as("hot"))
      .select(col("seg"), col("pb"), col("n_posts"), col("n_digests"),
        col("hot.h").as("hot_h"), col("hot.df").as("hot_df"))
      .localCheckpoint()
    val expected = perBucket
      .crossJoin(broadcast(perBucket.agg(
        sum(col("n_posts")).as("n_total"),
        count(lit(1)).as("n_buckets"))))
      .select(col("seg"), col("pb"), col("n_posts"), col("n_digests"),
        col("hot_h"), col("hot_df"), col("n_total"), col("n_buckets"),
        expr("CAST(n_posts AS DECIMAL(38,0)) * n_buckets * 1000" +
          " div n_total")
          .as("balance_permille"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected,
      "the _posts balance report must equal the corpus recomputation")
  }

  test("a persisted posting-bucket modulus that differs from the " +
    "build's refuses loudly; full compaction heals") {
    // ExactPb is compiled into writer and reader; the _posts/_pb
    // marker is what catches a FUTURE change to it against previously
    // written roots — serving with a mismatched modulus would
    // silently misprune (seg, pb) partitions and break the
    // unconditional-recall guarantee. Simulate the old-root case by
    // rewriting the marker.
    val stored = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val root = tmpRoot("expb")
    TextOps.minhashIndexWrite(stored.where(col("doc_id") % 2 === 0),
      root, exact = true)
    TextOps.minhashIndexAppend(stored.where(col("doc_id") % 2 =!= 0),
      root)
    val marker = new org.apache.hadoop.fs.Path(
      s"$root/docs/seg=0/_posts/_pb")
    Seq(0, 1).foreach(k => assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/docs/seg=$k/_posts/_pb")),
      s"segment $k must persist the modulus"))
    val out = fs.create(marker, true)
    try out.write("32".getBytes("UTF-8")) finally out.close()
    Seq(
      () => TextOps.nearDupServeExact(spark, root, batch).collect(),
      () => TextOps.minhashIndexAppend(batch, root): Any
    ).foreach { op =>
      val e = intercept[IllegalArgumentException] { op() }
      assert(e.getMessage.contains("posting-bucket modulus mismatch"),
        s"expected the modulus refusal, got: ${e.getMessage}")
    }
    // the advertised healer regenerates the layout under the current
    // modulus; serving is brute-force-exact again
    assert(TextOps.minhashIndexCompact(spark, root) >= 1)
    assert(servedExact(root, batch) == bruteCross(stored, batch, 0.7),
      "a healed root must serve exactly under the current modulus")
  }

  test("lifecycle: appends inherit the exact layout, deletes mask, " +
    "tail and full compaction regenerate the postings, and serving " +
    "equals brute force throughout") {
    val batch = docs.where(col("doc_id") % 5 === 0)
    def slice(i: Int) =
      docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 4 === i)
    val root = tmpRoot("exlife")
    TextOps.minhashIndexWrite(slice(0), root, exact = true)
    (1 until 4).foreach(i => TextOps.minhashIndexAppend(slice(i), root))
    // every appended segment self-described into the exact layout
    (0 until 4).foreach(k => assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/docs/seg=$k/_posts")),
      s"appended segment $k lost the _posts sidecar"))
    val all = docs.where(col("doc_id") % 5 =!= 0)
    assert(servedExact(root, batch) == bruteCross(all, batch, 0.7))

    // a snapshot pinned BEFORE the deletions must keep serving the
    // capture-time view (tombstones land after capture = invisible)
    val snap = EmbeddingOps.indexSnapshot(spark, root)
    val atCapture = servedExact(root, batch)

    // tombstones mask exactly: the live slice is the new brute truth
    TextOps.minhashIndexDelete(spark, root,
      all.where(col("doc_id") % 3 === 0).select(col("doc_id")))
    val live = all.where(col("doc_id") % 3 =!= 0)
    val afterDelete = servedExact(root, batch)
    assert(afterDelete == bruteCross(live, batch, 0.7))
    assert(TextOps.nearDupServeExact(spark, root, batch, 0.7,
        asOf = Some(snap))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
        col("nb"))
      .collect().map(_.toString).sorted.toSeq == atCapture,
      "the pinned exact serve must replay the capture-time view")

    // tail compaction regenerates _posts for the merged segment and
    // serving is unchanged
    assert(TextOps.minhashIndexCompactTail(spark, root,
      maxSegments = 2) == 3)
    val segsAfterTail = EmbeddingOps.committedSegs(fs,
      new org.apache.hadoop.fs.Path(root, "_segs"))._2
    segsAfterTail.foreach(k => assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/docs/seg=$k/_posts")),
      s"tail-compacted segment $k lost the _posts sidecar"))
    assert(servedExact(root, batch) == afterDelete)

    // full compaction applies tombstones physically, regenerates the
    // postings, and serving is still brute-force-equal
    assert(TextOps.minhashIndexCompact(spark, root) >= 1)
    assert(servedExact(root, batch) == afterDelete)
  }

  test("a plain root refuses exact serving; a mixed chain refuses " +
    "loudly everywhere") {
    val stored = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val plain = tmpRoot("explain")
    TextOps.minhashIndexWrite(stored, plain)
    val e = intercept[IllegalArgumentException] {
      TextOps.nearDupServeExact(spark, plain, batch).collect()
    }
    assert(e.getMessage.contains("no _posts posting sidecars"))
    // the plain root still appends and serves banded, unaffected
    TextOps.minhashIndexAppend(batch, plain)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$plain/docs/seg=1/_posts")),
      "a plain chain must not grow posting sidecars")

    // a mixed chain (simulating a maintenance bug or manual copy)
    // refuses at the probe — serve AND append
    val mixed = tmpRoot("exmixed")
    TextOps.minhashIndexWrite(
      stored.where(col("doc_id") % 2 === 0), mixed, exact = true)
    TextOps.minhashIndexAppend(stored.where(col("doc_id") % 2 =!= 0),
      mixed)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$mixed/docs/seg=1/_posts"), true)
    val e2 = intercept[IllegalArgumentException] {
      TextOps.nearDupServeExact(spark, mixed, batch).collect()
    }
    assert(e2.getMessage.contains("mixed exact/non-exact"))
    val e3 = intercept[IllegalArgumentException] {
      TextOps.minhashIndexAppend(batch, mixed)
    }
    assert(e3.getMessage.contains("mixed exact/non-exact"))
    // the full compaction is the advertised HEALER: it regenerates
    // one uniform exact layout from the live rows, after which the
    // chain appends and serves exactly again
    assert(TextOps.minhashIndexCompact(spark, mixed) >= 1)
    assert(TextOps.nearDupServeExact(spark, mixed, batch)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
        col("nb"))
      .collect().map(_.toString).sorted.toSeq ==
      bruteCross(stored, batch, 0.7),
      "a healed chain must serve exactly")
  }

  test("shard merge: exact roots stitch and serve exactly; an " +
    "exact/plain mix refuses at validation") {
    val stored = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val parent = java.nio.file.Files
      .createTempDirectory("graft_exmerge").toString
    val shards = (0 until 2).map { i =>
      val p = s"$parent/shard$i"
      TextOps.minhashIndexWrite(
        stored.where(col("doc_id") % 2 === i), p, exact = true)
      p
    }
    TextOps.minhashIndexMerge(spark, shards, s"$parent/merged")
    assert(servedExact(s"$parent/merged", batch) ==
      bruteCross(stored, batch, 0.7),
      "merged exact shards must serve like the one-shot exact build")

    val p2 = java.nio.file.Files
      .createTempDirectory("graft_exmerge2").toString
    TextOps.minhashIndexWrite(
      stored.where(col("doc_id") % 2 === 0), s"$p2/ex", exact = true)
    TextOps.minhashIndexWrite(
      stored.where(col("doc_id") % 2 =!= 0), s"$p2/pl")
    val e = intercept[IllegalArgumentException] {
      TextOps.minhashIndexMerge(spark,
        Seq(s"$p2/ex", s"$p2/pl"), s"$p2/merged")
    }
    assert(e.getMessage.contains("layout differs across merge sources"))
  }

  test("streamed ingestion into an exact root writes postings per " +
    "segment; exact serving equals the one-shot exact build") {
    val stored = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val root = tmpRoot("exing")
    TextOps.minhashIndexWrite(
      stored.where(col("doc_id") % 3 === 0), root, exact = true)
    val streamDir = java.nio.file.Files
      .createTempDirectory("graft_exing_stream").toString
    Seq(1, 2).foreach(i => stored.where(col("doc_id") % 3 === i)
      .coalesce(1).write.mode("append").parquet(streamDir))
    val q = graft.streaming.Streams.minhashIngestSink(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir),
        root, java.nio.file.Files
          .createTempDirectory("graft_exing_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not finish in time")
    (0 until 3).foreach(k => assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/docs/seg=$k/_posts")),
      s"streamed segment $k lost the _posts sidecar"))
    val oneShot = tmpRoot("exing_ref")
    TextOps.minhashIndexWrite(stored, oneShot, exact = true)
    assert(servedExact(root, batch) == servedExact(oneShot, batch),
      "streamed exact index must serve exactly like the one-shot build")
  }

  test("curate's benchmarkAsOf pins the decontamination gate: the " +
    "pinned funnel equals the capture-slice recompute while the " +
    "live gate sees the append") {
    import org.apache.spark.sql.functions.regexp_replace
    // a training run screens MANY batches against one benchmark
    // list: pinning the persisted index's capture-time view keeps
    // early and late funnels agreeing about what was clean even
    // while benchmark appends land mid-run. Machine-proof: the
    // pinned funnel must be ROW-IDENTICAL to the in-flight recompute
    // over the capture slice alone, and the UNPINNED funnel must
    // differ (the appended slice gates more docs) — the pin is doing
    // real work, not vacuously agreeing.
    def extracted(df: DataFrame): DataFrame =
      TextOps.extractHtml(SuiteMLShared.htmlFixture(df))
        .select(col("doc_id"),
          regexp_replace(col("text_extracted"), "\n", " ").as("text"))
    val sliceA = docs.where(col("doc_id") % 20 === 0)
    val sliceB = docs.where(col("doc_id") % 20 === 10)
    val root = tmpRoot("excurasof")
    TextOps.minhashIndexWrite(extracted(sliceA), root, exact = true)
    val snap = EmbeddingOps.indexSnapshot(spark, root)
    TextOps.minhashIndexAppend(extracted(sliceB), root)
    def funnel(benchmark: Option[DataFrame],
        ix: Option[String],
        asOf: Option[graft.operators.IndexSnapshot]): Seq[String] =
      TextOps.curateReport(SuiteMLShared.htmlFixture(docs),
          benchmark = benchmark, benchmarkIndex = ix,
          benchmarkAsOf = asOf)
        .collect().map(_.toString).sorted.toSeq
    val pinned = funnel(None, Some(root), Some(snap))
    val recompute = funnel(Some(extracted(sliceA)), None, None)
    assert(pinned == recompute,
      "the pinned served gate must equal the capture-slice recompute")
    val live = funnel(None, Some(root), None)
    assert(live != pinned,
      "the live gate must see the appended benchmark slice — a " +
        "vacuous pin proves nothing")
    // the contract refuses a pin without a persisted index to pin
    val e = intercept[IllegalArgumentException] {
      TextOps.curateReport(SuiteMLShared.htmlFixture(docs),
        benchmark = Some(extracted(sliceA)), benchmarkAsOf = Some(snap))
    }
    assert(e.getMessage.contains("needs benchmarkIndex"),
      s"expected the benchmarkAsOf contract refusal, got: ${e.getMessage}")
  }
}
