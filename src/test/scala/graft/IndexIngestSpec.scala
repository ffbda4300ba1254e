package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.{EmbeddingOps, TextOps}
import graft.streaming.Streams

/** Exactly-once streaming ingestion into the persisted serving
  * indexes ([[Streams.minhashIngestSink]] et al.): a real file-source
  * stream must converge to the one-shot batch build, and the replay
  * protocol must hold at every crash window — a replayed micro-batch
  * never appends a second segment, a crash between the segment commit
  * and the progress write resolves through the stamp, and maintenance
  * refuses while that window is open. */
class IndexIngestSpec extends SparkSpec {

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def segsOf(root: String): Seq[Int] =
    EmbeddingOps.committedSegs(fs,
      new org.apache.hadoop.fs.Path(root, "_segs"))._2

  private def hwmOf(root: String): Long =
    EmbeddingOps.readLongMarker(fs,
      new org.apache.hadoop.fs.Path(root, "_ingest/hwm")).getOrElse(-1L)

  private def served(root: String, batch: DataFrame): Seq[String] =
    TextOps.nearDupServe(spark, root, batch)
      .collect().map(_.toString).sorted.toSeq

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  private def foldMinhash(root: String, batch: DataFrame, b: Long,
      qid: String = "q-test",
      failpoint: String => Unit = _ => ()): Unit =
    Streams.indexIngestBatch(batch, b, root, qid, "docs", failpoint)(
      (df, stamp) => TextOps.minhashIndexAppend(df, root, stamp = stamp))

  test("streamed minhash ingest equals the one-shot build, exactly once across restarts") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val stored = docs.where(col("doc_id") % 5 =!= 0)
    val probe = docs.where(col("doc_id") % 5 === 0)

    val root = tmpDir("ing_mh") + "/ix"
    TextOps.minhashIndexWrite(stored.where(col("doc_id") % 3 === 0), root)

    // two parquet files -> two micro-batches through a REAL stream
    val streamDir = tmpDir("ing_stream")
    Seq(1, 2).foreach(i => stored.where(col("doc_id") % 3 === i)
      .coalesce(1).write.mode("append").parquet(streamDir))
    val ckpt = tmpDir("ing_ckpt")
    def run(): Unit = {
      val q = Streams.minhashIngestSink(
          spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1").parquet(streamDir),
          root, ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(180000), "stream did not finish in time")
    }
    run()

    val oneShot = tmpDir("ing_ref") + "/ix"
    TextOps.minhashIndexWrite(stored, oneShot)
    assert(served(root, probe) == served(oneShot, probe),
      "streamed index must serve exactly like the one-shot build")
    val after = segsOf(root)
    assert(after.size == 3, s"seed + 2 streamed segments, got $after")

    // restart with the same checkpoint and no new data: the replayed
    // run must leave the index byte-identical (no new segments)
    run()
    assert(segsOf(root) == after,
      "a restarted stream with no new data must append nothing")
    assert(served(root, probe) == served(oneShot, probe))
  }

  test("auto-maintenance inside the sink keeps the chain bounded while serving stays equal to the one-shot build") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val stored = docs.where(col("doc_id") % 5 =!= 0)
    val probe = docs.where(col("doc_id") % 5 === 0)

    val root = tmpDir("ing_auto") + "/ix"
    TextOps.minhashIndexWrite(stored.where(col("doc_id") % 4 === 0),
      root)
    val streamDir = tmpDir("ing_auto_stream")
    Seq(1, 2, 3).foreach(i => stored.where(col("doc_id") % 4 === i)
      .coalesce(1).write.mode("append").parquet(streamDir))
    val q = Streams.minhashIngestSink(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir),
        root, tmpDir("ing_auto_ckpt"),
        maintainEvery = 1, maxSegments = 2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not finish in time")

    assert(segsOf(root).size <= 2,
      s"the in-sink policy must bound the chain, got ${segsOf(root)}")
    val oneShot = tmpDir("ing_auto_ref") + "/ix"
    TextOps.minhashIndexWrite(stored, oneShot)
    assert(served(root, probe) == served(oneShot, probe),
      "maintained streamed index must serve like the one-shot build")
  }

  test("replayed and crash-window batches resolve without duplicate segments") {
    val base = docsDf(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "a"),
      (2L, "alpha beta gamma delta epsilon eta", "en", "a"),
      (3L, "one two three four five six seven", "en", "b")))
    val b0 = docsDf(Seq(
      (10L, "alpha beta gamma delta epsilon zeta", "en", "c"),
      (11L, "totally different words here apart entirely", "en", "c")))
    val b1 = docsDf(Seq(
      (20L, "one two three four five six seven", "en", "d")))
    val probe = docsDf(Seq(
      (90L, "alpha beta gamma delta epsilon zeta", "en", "p"),
      (91L, "one two three four five six seven", "en", "p")))

    val root = tmpDir("ing_replay") + "/ix"
    TextOps.minhashIndexWrite(base, root)

    foldMinhash(root, b0, 0L)
    assert(hwmOf(root) == 0L)
    val afterB0 = segsOf(root)
    foldMinhash(root, b0, 0L) // replay of a fully-committed batch
    assert(segsOf(root) == afterB0 && hwmOf(root) == 0L,
      "a fully-committed replayed batch must be a no-op")

    // crash between the segment commit and the progress write
    final class Kill extends RuntimeException
    intercept[Kill] {
      foldMinhash(root, b1, 1L,
        failpoint = t => if (t == "appended") throw new Kill)
    }
    assert(hwmOf(root) == 0L, "the crash left the progress write undone")
    val afterCrash = segsOf(root)
    assert(afterCrash.size == afterB0.size + 1,
      "the crashed batch's segment DID commit")

    foldMinhash(root, b1, 1L) // the restart's replay
    assert(segsOf(root) == afterCrash,
      "the replay must resolve through the stamp, never re-append")
    assert(hwmOf(root) == 1L)

    // an empty replay-slot batch advances progress without a segment
    foldMinhash(root, docsDf(Seq.empty), 2L)
    assert(segsOf(root) == afterCrash && hwmOf(root) == 2L)

    val oneShot = tmpDir("ing_replay_ref") + "/ix"
    TextOps.minhashIndexWrite(base.unionByName(b0).unionByName(b1),
      oneShot)
    assert(served(root, probe) == served(oneShot, probe),
      "the resolved stream history must serve like the one-shot build")
  }

  test("an index root binds to one ingest stream") {
    val base = docsDf(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "a")))
    val root = tmpDir("ing_bind") + "/ix"
    TextOps.minhashIndexWrite(base, root)
    foldMinhash(root, base, 0L, qid = "q-A")

    val e = intercept[IllegalArgumentException] {
      foldMinhash(root, base, 1L, qid = "q-B")
    }
    assert(e.getMessage.contains("bound to ingest stream 'q-A'"))

    // progress without a binding marker: a partially-cleared _ingest
    // must refuse rather than silently rebind (and re-append)
    fs.delete(new org.apache.hadoop.fs.Path(root, "_ingest/run"), false)
    val e2 = intercept[IllegalArgumentException] {
      foldMinhash(root, base, 1L, qid = "q-B")
    }
    assert(e2.getMessage.contains("no run marker"))
  }

  test("maintenance refuses an unresolved in-flight batch; the binding survives compaction") {
    val base = docsDf(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "a"),
      (2L, "one two three four five six seven", "en", "b")))
    val b0 = docsDf(Seq(
      (10L, "alpha beta gamma delta epsilon zeta", "en", "c")))
    val b1 = docsDf(Seq(
      (20L, "one two three four five six seven", "en", "d")))
    val probe = docsDf(Seq(
      (90L, "alpha beta gamma delta epsilon zeta", "en", "p"),
      (91L, "one two three four five six seven", "en", "p")))

    val root = tmpDir("ing_maint") + "/ix"
    TextOps.minhashIndexWrite(base, root)
    final class Kill extends RuntimeException
    intercept[Kill] {
      foldMinhash(root, b0, 0L,
        failpoint = t => if (t == "appended") throw new Kill)
    }

    // the stamp is past the high-water mark: compaction would erase
    // it and the restarted stream would re-append the batch — refuse
    val e = intercept[IllegalStateException] {
      TextOps.minhashIndexCompact(spark, root)
    }
    assert(e.getMessage.contains("in-flight streaming-ingest batch b0"))

    foldMinhash(root, b0, 0L) // the stream restart resolves it
    assert(TextOps.minhashIndexCompact(spark, root) > 0,
      "a resolved root must compact")

    // the binding rode the swap: the same stream continues, replayed
    // batches still skip, and new batches append
    assert(hwmOf(root) == 0L, "the high-water mark must survive the swap")
    foldMinhash(root, b0, 0L)
    assert(segsOf(root).size == 1, "a pre-compaction batch must not re-append")
    foldMinhash(root, b1, 1L)
    assert(segsOf(root).size == 2 && hwmOf(root) == 1L)

    val oneShot = tmpDir("ing_maint_ref") + "/ix"
    TextOps.minhashIndexWrite(base.unionByName(b0).unionByName(b1),
      oneShot)
    assert(served(root, probe) == served(oneShot, probe))
  }

  test("a pinned (asOf) serve spans an IN-SINK tail compaction " +
    "byte-identically; the next in-sink sweep expires the token loudly") {
    // the operator-door version of this contract rides
    // TailCompactSpec; this is the STREAMING context — the compaction
    // fires from the sink's own maintainEvery turn, between two
    // micro-batches of a live stream, while a training run holds a
    // snapshot token captured mid-stream
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val stored = docs.where(col("doc_id") % 5 =!= 0)
    val probe = docs.where(col("doc_id") % 5 === 0)
    val root = tmpDir("ing_pin") + "/ix"
    // one BIG seed so the size-tiered tail always spares it
    TextOps.minhashIndexWrite(stored.where(col("doc_id") % 8 < 5), root)
    val streamDir = tmpDir("ing_pin_stream")
    val ckpt = tmpDir("ing_pin_ckpt")
    def run(): Unit = {
      val q = Streams.minhashIngestSink(
          spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1").parquet(streamDir),
          root, ckpt, maintainEvery = 1, maxSegments = 2)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(180000), "stream did not finish in time")
    }
    def feed(i: Int): Unit = stored.where(col("doc_id") % 8 === i)
      .coalesce(1).write.mode("append").parquet(streamDir)

    feed(5); run() // 2 segs == maxSegments: the policy door no-ops
    assert(segsOf(root).size == 2)
    val snap = EmbeddingOps.indexSnapshot(spark, root)
    def pinned(): Seq[String] =
      TextOps.nearDupServe(spark, root, probe, asOf = Some(snap))
        .collect().map(_.toString).sorted.toSeq
    val atCapture = pinned()

    feed(6); run() // 3 segs: the sink's own turn tail-merges to 2
    assert(segsOf(root).size == 2,
      "the in-sink maintenance turn must have tail-compacted")
    assert(pinned() == atCapture,
      "the pinned view must serve byte-identically across the " +
        "in-sink tail compaction (one cycle of retention grace)")
    // unpinned serving meanwhile equals the one-shot build
    val oneShot = tmpDir("ing_pin_ref") + "/ix"
    TextOps.minhashIndexWrite(stored.where(col("doc_id") % 8 < 7),
      oneShot)
    assert(served(root, probe) == served(oneShot, probe))

    feed(7); run() // the next turn's sweep expires the token LOUDLY
    val e = intercept[IllegalArgumentException] { pinned() }
    assert(e.getMessage.contains("snapshot expired"),
      s"expected the loud token expiry, got: ${e.getMessage}")
  }

  test("a crash-window stamp BURIED by a direct operator append still " +
    "resolves on replay and still blocks maintenance") {
    // the newest-segment-only scan's blind spot: a public append door
    // used after the crash pushes the stamped segment one position
    // down the listing. The resolve and the maintenance guard both
    // scan every committed segment now — neither a duplicate append
    // nor a stamp-erasing compaction can slip through the burial.
    val base = docsDf(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "a"),
      (2L, "one two three four five six seven", "en", "b")))
    val b0 = docsDf(Seq(
      (10L, "alpha beta gamma delta epsilon zeta", "en", "c")))
    val b1 = docsDf(Seq(
      (20L, "one two three four five six seven", "en", "d")))
    val direct = docsDf(Seq(
      (30L, "unrelated brand new content entirely apart", "en", "e")))
    val probe = docsDf(Seq(
      (90L, "alpha beta gamma delta epsilon zeta", "en", "p"),
      (91L, "one two three four five six seven", "en", "p")))

    val root = tmpDir("ing_bury") + "/ix"
    TextOps.minhashIndexWrite(base, root)
    foldMinhash(root, b0, 0L)
    final class Kill extends RuntimeException
    intercept[Kill] {
      foldMinhash(root, b1, 1L,
        failpoint = t => if (t == "appended") throw new Kill)
    }
    // the burial: a direct append lands after the crash
    TextOps.minhashIndexAppend(direct, root)
    assert(hwmOf(root) == 0L)

    // maintenance must find the buried stamp, not just the newest
    val e = intercept[IllegalStateException] {
      TextOps.minhashIndexCompact(spark, root)
    }
    assert(e.getMessage.contains("in-flight streaming-ingest batch b1"))
    val e2 = intercept[IllegalStateException] {
      TextOps.minhashIndexCompactTail(spark, root, maxSegments = 1)
    }
    assert(e2.getMessage.contains("in-flight streaming-ingest batch b1"))

    // the restart must resolve through the buried stamp — a
    // newest-only resolve would re-append b1 (silent duplicates)
    val beforeReplay = segsOf(root)
    foldMinhash(root, b1, 1L)
    assert(segsOf(root) == beforeReplay,
      "the replay must resolve through the buried stamp, never re-append")
    assert(hwmOf(root) == 1L)

    // resolved: maintenance proceeds and serving matches the one-shot
    // build over the full history including the direct append
    assert(TextOps.minhashIndexCompact(spark, root) > 0)
    val oneShot = tmpDir("ing_bury_ref") + "/ix"
    TextOps.minhashIndexWrite(
      base.unionByName(b0).unionByName(b1).unionByName(direct), oneShot)
    assert(served(root, probe) == served(oneShot, probe))
  }

  test("stamps from a dead binding never match a new binding's batch " +
    "ids, and never block its maintenance") {
    // the documented recovery — clear the whole _ingest directory,
    // point a fresh checkpoint at the root — restarts batch numbering
    // at 0 under a NEW query id. The dead binding's stamps stay on
    // committed segments forever (stamps are never deleted once
    // resolved); an un-namespaced replay check would read the old
    // _ingest-b0 as "batch 0 already appended" and silently skip the
    // new stream's first appends while still advancing hwm — silent
    // data loss. Namespacing makes them inert: invisible to the new
    // binding's resolve scan AND to the maintenance guard, so the
    // next compaction garbage-collects them instead of blocking on an
    // in-flight batch no stream will ever resolve.
    val base = docsDf(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "a")))
    val b0A = docsDf(Seq(
      (10L, "one two three four five six seven", "en", "b")))
    val b1A = docsDf(Seq(
      (20L, "eight nine ten eleven twelve thirteen fourteen", "en", "c")))
    val b0B = docsDf(Seq(
      (30L, "completely new content arriving after the rebind", "en", "d")))
    val probe = docsDf(Seq(
      (90L, "completely new content arriving after the rebind", "en", "p")))

    val root = tmpDir("ing_rebind") + "/ix"
    TextOps.minhashIndexWrite(base, root)
    foldMinhash(root, b0A, 0L, qid = "q-A") // resolved: stamp + hwm=0
    final class Kill extends RuntimeException
    intercept[Kill] { // crash window: stamp .b1 committed, hwm stays 0
      foldMinhash(root, b1A, 1L, qid = "q-A",
        failpoint = t => if (t == "appended") throw new Kill)
    }
    val afterA = segsOf(root)

    // the recovery: clear _ingest wholesale, rebind a fresh stream
    fs.delete(new org.apache.hadoop.fs.Path(root, "_ingest"), true)
    foldMinhash(root, b0B, 0L, qid = "q-B")
    assert(segsOf(root).size == afterA.size + 1,
      "the new binding's batch 0 must append — a dead binding's b0 " +
        "stamp must never read as already-appended")
    assert(hwmOf(root) == 0L)
    foldMinhash(root, b0B, 0L, qid = "q-B") // its own replay no-ops
    assert(segsOf(root).size == afterA.size + 1)

    // q-A's .b1 stamp sits past q-B's hwm=0, but belongs to a dead
    // binding: maintenance must proceed, not refuse forever
    assert(TextOps.minhashIndexCompact(spark, root) > 0,
      "a dead binding's past-hwm stamp must not block compaction")
    val oneShot = tmpDir("ing_rebind_ref") + "/ix"
    TextOps.minhashIndexWrite(
      base.unionByName(b0A).unionByName(b1A).unionByName(b0B), oneShot)
    assert(served(root, probe) == served(oneShot, probe),
      "the rebound history must serve like the one-shot build")
  }

  test("a LEGACY un-namespaced crash-window stamp still resolves: the " +
    "replay skips the append and advances progress") {
    // upgrade compatibility: a root written by the pre-namespacing
    // build that crashed between its segment commit and its progress
    // write carries `_ingest-b<id>` with no binding. The SAME
    // stream's post-upgrade replay must honor it — re-appending
    // would be the silent duplicate the stamp protocol exists to
    // prevent (the maintenance guard already blocks compaction on
    // legacy stamps past hwm; the two doors must tell one story).
    val base = docsDf(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "a")))
    val b0 = docsDf(Seq(
      (10L, "one two three four five six seven", "en", "b")))
    val b1 = docsDf(Seq(
      (20L, "eight nine ten eleven twelve thirteen fourteen", "en", "c")))
    val root = tmpDir("ing_legacy") + "/ix"
    TextOps.minhashIndexWrite(base, root)
    foldMinhash(root, b0, 0L, qid = "q-up")
    // simulate the old build's crash window: batch 1's segment
    // committed with a LEGACY stamp, progress write lost
    TextOps.minhashIndexAppend(b1, root)
    val newest = segsOf(root).max
    fs.create(new org.apache.hadoop.fs.Path(root,
      s"docs/seg=$newest/_ingest-b1"), false).close()
    assert(hwmOf(root) == 0L)
    val before = segsOf(root)
    foldMinhash(root, b1, 1L, qid = "q-up") // the post-upgrade replay
    assert(segsOf(root) == before,
      "a legacy stamp must resolve the batch — never re-append")
    assert(hwmOf(root) == 1L)
  }

  test("a FRESH binding refuses a root carrying legacy stamps; " +
    "full compaction heals the bind") {
    // the other half of the legacy-honor contract: stamps cannot
    // prove WHICH binding wrote them, so a NEW stream (batch ids
    // restarting at 0 after the documented clear-and-rebind
    // recovery) binding over lingering debris would silently skip
    // any batch id that matches — the silent loss the namespacing
    // exists to prevent. The claim path refuses BEFORE claiming and
    // names the heal; the compact-first ordering is mechanical, not
    // a doc footnote.
    val base = docsDf(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "a")))
    val b0 = docsDf(Seq(
      (10L, "one two three four five six seven", "en", "b")))
    val b1 = docsDf(Seq(
      (20L, "eight nine ten eleven twelve thirteen fourteen", "en", "c")))
    val root = tmpDir("ing_legacy_bind") + "/ix"
    TextOps.minhashIndexWrite(base, root)
    TextOps.minhashIndexAppend(b0, root)
    val newest = segsOf(root).max
    fs.create(new org.apache.hadoop.fs.Path(root,
      s"docs/seg=$newest/_ingest-b0"), false).close()
    val e = intercept[IllegalArgumentException] {
      foldMinhash(root, b1, 0L, qid = "q-fresh")
    }
    assert(e.getMessage.contains("legacy un-namespaced replay stamps"),
      s"expected the legacy-stamp refusal, got: ${e.getMessage}")
    // the refusal fired before the claim: the root stays unbound
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root,
      "_ingest/run")), "a refused claim must leave the root unclaimed")
    // the named heal retires the stamps; the fresh binding then
    // APPENDS its batch 0 instead of silently skipping it
    assert(TextOps.minhashIndexCompact(spark, root) >= 1)
    val compacted = segsOf(root)
    foldMinhash(root, b1, 0L, qid = "q-fresh")
    assert(segsOf(root).size == compacted.size + 1,
      "the healed bind must append — the retired stamp must not " +
        "resolve the new stream's batch 0")
    assert(hwmOf(root) == 0L)
  }

  test("a crashed half-written claim fails safe: every stream refuses " +
    "until _ingest is cleared") {
    // the create-exclusive claim's one crash window (between create
    // and close) leaves an empty marker — the protocol's answer is
    // NO writer (loud refusal for everyone), never two
    val base = docsDf(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "a")))
    val root = tmpDir("ing_claimcrash") + "/ix"
    TextOps.minhashIndexWrite(base, root)
    val dir = new org.apache.hadoop.fs.Path(root, "_ingest")
    fs.mkdirs(dir)
    fs.create(new org.apache.hadoop.fs.Path(dir, "run"), false).close()
    Seq("q-A", "q-B").foreach { qid =>
      val e = intercept[IllegalArgumentException] {
        foldMinhash(root, base, 0L, qid = qid)
      }
      assert(e.getMessage.contains("bound to ingest stream ''"),
        s"claimant $qid must refuse the half-written claim loudly")
    }
    assert(segsOf(root).size == 1,
      "no claimant may append past a corrupt binding")
  }

  test("banded (phash) ingest: replayed and crash-window batches resolve; serving equals the one-shot build") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val media = graft.operators.Multimodal
      .syntheticPngMedia(docs.where(col("doc_id") < 60)).localCheckpoint()
    val seed = media.where(col("doc_id") % 3 === 0)
    val b0 = media.where(col("doc_id") % 3 === 1)
    val b1 = media.where(col("doc_id") % 3 === 2)
    val probe = graft.operators.Multimodal.syntheticPngMedia(
      docs.where(col("doc_id") >= 60 && col("doc_id") < 80))

    val root = tmpDir("ing_phash") + "/ix"
    graft.operators.Multimodal.phashIndexWrite(seed, root)
    def fold(b: Long, batch: DataFrame,
        failpoint: String => Unit = _ => ()): Unit =
      Streams.indexIngestBatch(batch, b, root, "q-ph", "bands",
        failpoint)(
        (df, stamp) => graft.operators.Multimodal
          .phashIndexAppend(df, root, stamp = stamp))

    fold(0L, b0)
    fold(0L, b0) // full replay: no-op
    final class Kill extends RuntimeException
    intercept[Kill] {
      fold(1L, b1, failpoint = t => if (t == "appended") throw new Kill)
    }
    intercept[IllegalStateException] {
      graft.operators.Multimodal.phashIndexCompact(spark, root)
    }
    fold(1L, b1) // resolve through the stamp
    assert(segsOf(root).size == 3 && hwmOf(root) == 1L)

    val oneShot = tmpDir("ing_phash_ref") + "/ix"
    graft.operators.Multimodal.phashIndexWrite(media, oneShot)
    def serve(p: String) = graft.operators.Multimodal
      .phashNearDupServe(spark, p, probe)
      .collect().map(_.toString).sorted.toSeq
    assert(serve(root) == serve(oneShot),
      "streamed banded segments must serve like the one-shot build")
    assert(graft.operators.Multimodal.phashIndexCompact(spark, root) > 0)
    assert(serve(root) == serve(oneShot))
  }

  test("streaming deletions mask exactly, tolerate crash-window duplicates, and bind independently of the data stream") {
    val base = docsDf(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "a"),
      (2L, "alpha beta gamma delta epsilon eta", "en", "a"),
      (3L, "one two three four five six seven", "en", "b")))
    val probe = docsDf(Seq(
      (90L, "alpha beta gamma delta epsilon zeta", "en", "p"),
      (91L, "one two three four five six seven", "en", "p")))
    val root = tmpDir("ing_del") + "/ix"
    TextOps.minhashIndexWrite(base, root)
    // a data-ingest binding coexists with the delete binding
    foldMinhash(root, base.where(col("doc_id") < 0), 0L, qid = "q-ing")

    import spark.implicits._
    def delsSegs: Seq[Int] = EmbeddingOps.committedSegs(fs,
      new org.apache.hadoop.fs.Path(root, "_dels"))._2
    def del(b: Long, ids: Seq[Long], qid: String = "q-del",
        failpoint: String => Unit = _ => ()): Unit =
      Streams.indexDeleteBatch(ids.toDF("doc_id"), b, root, qid,
        "doc_id", failpoint)

    val before = served(root, probe)
    del(0L, Seq(3L))
    val masked = served(root, probe)
    assert(masked != before && masked ==
      TextOps.nearDupServe(spark, root, probe).collect()
        .map(_.toString).sorted.toSeq)
    val after0 = delsSegs
    del(0L, Seq(3L)) // fully-committed replay: no tombstone bloat
    assert(delsSegs == after0)

    // crash window: tombstone committed, progress write lost — the
    // replay re-appends (duplicate segment, masking unchanged)
    final class Kill extends RuntimeException
    intercept[Kill] {
      del(1L, Seq(1L), failpoint = t => if (t == "deleted") throw new Kill)
    }
    val afterCrash = delsSegs
    del(1L, Seq(1L))
    assert(delsSegs.size == afterCrash.size + 1,
      "the crash-window replay duplicates the tombstone segment")
    assert(served(root, probe) ==
      TextOps.nearDupServe(spark, root, probe).collect()
        .map(_.toString).sorted.toSeq)
    assert(served(root, probe).forall(!_.contains("[1,")),
      "doc 1 is masked despite the duplicate")

    // the delete binding refuses a different stream, independently
    // of the data binding
    val e = intercept[IllegalArgumentException] {
      del(2L, Seq(2L), qid = "q-other")
    }
    assert(e.getMessage.contains("bound to ingest stream 'q-del'"))
    foldMinhash(root, base.where(col("doc_id") < 0), 1L, qid = "q-ing")
  }

  test("ivfpq ingest: crash-window folds equal direct appends (the trained quantizers are fixed, so the sink is exactly the replay-safe append)") {
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings
      .localCheckpoint()
    val seed = emb.where(col("vec_id") % 3 === 0)
    val b0 = emb.where(col("vec_id") % 3 === 1)
    val b1 = emb.where(col("vec_id") % 3 === 2)
    val q = emb.where(col("vec_id") < 5)

    val viaSink = tmpDir("ing_ivfpq") + "/ix"
    graft.operators.EmbeddingOps.ivfpqIndexWrite(seed, viaSink)
    def fold(b: Long, batch: DataFrame,
        failpoint: String => Unit = _ => ()): Unit =
      Streams.indexIngestBatch(batch, b, viaSink, "q-ivfpq", "codes",
        failpoint)(
        (df, stamp) => graft.operators.EmbeddingOps
          .ivfpqIndexAppend(df, viaSink, stamp = stamp))
    fold(0L, b0)
    fold(0L, b0) // replay no-op
    final class Kill extends RuntimeException
    intercept[Kill] {
      fold(1L, b1, failpoint = t => if (t == "appended") throw new Kill)
    }
    fold(1L, b1) // resolve
    assert(segsOf(viaSink).size == 3 && hwmOf(viaSink) == 1L)

    // reference: the SAME seed build + direct appends (the trained
    // quantizers are fixed at build, so serve equality is exact)
    val direct = tmpDir("ing_ivfpq_ref") + "/ix"
    graft.operators.EmbeddingOps.ivfpqIndexWrite(seed, direct)
    graft.operators.EmbeddingOps.ivfpqIndexAppend(b0, direct)
    graft.operators.EmbeddingOps.ivfpqIndexAppend(b1, direct)
    def serve(p: String) = graft.operators.EmbeddingOps
      .ivfpqTopKIndexed(spark, p, q)
      .collect().map(_.toString).sorted.toSeq
    assert(serve(viaSink) == serve(direct))
  }

  test("bm25 ingest: streamed segments serve like the one-shot build, compaction guard included") {
    val base = docsDf(Seq(
      (1L, "spark shuffles partition data across executors", "en", "a"),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "a")))
    val b0 = docsDf(Seq(
      (10L, "spark executors cache partition data in memory", "en", "b"),
      (11L, "a lazy dog sleeps all day", "en", "b")))
    val terms = Seq("spark", "partition", "dog")

    val root = tmpDir("ing_bm25") + "/ix"
    TextOps.bm25IndexWrite(base, root, nBuckets = 16)
    def fold(b: Long, batch: DataFrame,
        failpoint: String => Unit = _ => ()): Unit =
      Streams.indexIngestBatch(batch, b, root, "q-bm25", "postings",
        failpoint)(
        (df, stamp) => TextOps.bm25IndexAppend(df, root, stamp = stamp))

    final class Kill extends RuntimeException
    intercept[Kill] {
      fold(0L, b0, failpoint = t => if (t == "appended") throw new Kill)
    }
    val e = intercept[IllegalStateException] {
      TextOps.bm25IndexCompact(spark, root)
    }
    assert(e.getMessage.contains("in-flight streaming-ingest batch b0"))
    fold(0L, b0) // resolve
    assert(hwmOf(root) == 0L && segsOf(root).size == 2)

    val oneShot = tmpDir("ing_bm25_ref") + "/ix"
    TextOps.bm25IndexWrite(base.unionByName(b0), oneShot, nBuckets = 16)
    def top(p: String) = TextOps.bm25TopKIndexed(spark, p, terms)
      .collect().map(_.toString).sorted.toSeq
    assert(top(root) == top(oneShot),
      "streamed bm25 segments must serve like the one-shot build")
    assert(TextOps.bm25IndexCompact(spark, root) > 0)
    assert(top(root) == top(oneShot),
      "compaction must not change serving")
  }
}
