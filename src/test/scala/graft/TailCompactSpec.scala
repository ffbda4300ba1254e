package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.{EmbeddingOps, TextOps}

/** Size-tiered tail compaction: merging only the smallest segments
  * must preserve serving exactly, leave the big segments' bytes
  * untouched, keep tombstones masking the survivors, give
  * pre-compaction pinned tokens one cycle of grace (then refuse
  * loudly at the sweep), and survive kills at every crash window. */
class TailCompactSpec extends SparkSpec {

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def segsOf(root: String): Seq[Int] =
    EmbeddingOps.committedSegs(fs,
      new org.apache.hadoop.fs.Path(root, "_segs"))._2

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag")
      .toString + "/ix"

  private val docs = Tables(SparkSpec.session, "/root/testdata/sf0.001")
    .documents

  /** Seed (big) + 4 small appended segments. */
  private def buildFiveSegs(root: String): Unit = {
    TextOps.minhashIndexWrite(
      docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 < 3), root)
    (3 until 7).foreach(i => TextOps.minhashIndexAppend(
      docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === i),
      root))
  }

  private def served(root: String): Seq[String] =
    TextOps.nearDupServe(spark, root,
        docs.where(col("doc_id") % 5 === 0))
      .collect().map(_.toString).sorted.toSeq

  test("tail compaction bounds the segment count at O(tail) IO, spares the big segment, and preserves serving; consumed dirs grace one cycle then sweep with a loud token expiry") {
    val root = tmpRoot("tailc")
    buildFiveSegs(root)
    assert(segsOf(root).size == 5)
    val before = served(root)
    val bigSegBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(root, "docs/seg=0")).getLength
    val bigSegMtime = fs.listStatus(
        new org.apache.hadoop.fs.Path(root, "docs/seg=0"))
      .map(_.getModificationTime).max

    val snap = EmbeddingOps.indexSnapshot(spark, root)
    val merged = TextOps.minhashIndexCompactTail(spark, root,
      maxSegments = 3)
    assert(merged == 3, s"5 segs -> 3 merges 3 smallest, got $merged")
    assert(segsOf(root).size == 3)
    assert(segsOf(root).contains(0),
      "the big seed segment must survive untouched")
    assert(fs.listStatus(
        new org.apache.hadoop.fs.Path(root, "docs/seg=0"))
      .map(_.getModificationTime).max == bigSegMtime &&
      fs.getContentSummary(new org.apache.hadoop.fs.Path(root,
        "docs/seg=0")).getLength == bigSegBytes,
      "tail compaction must not rewrite the spared segment's bytes")
    assert(served(root) == before,
      "serving must be identical after tail compaction")

    // the pre-compaction token still serves byte-identically: no
    // epoch bump, consumed dirs still on disk
    val pinned = TextOps.nearDupServe(spark, root,
        docs.where(col("doc_id") % 5 === 0), asOf = Some(snap))
      .collect().map(_.toString).sorted.toSeq
    assert(pinned == before, "one cycle of pinned-read grace")

    // the next tail compaction sweeps: epoch bumps FIRST, the old
    // token refuses loudly, and serving stays identical
    assert(TextOps.minhashIndexCompactTail(spark, root,
      maxSegments = 3) == 0)
    val e = intercept[IllegalArgumentException] {
      TextOps.nearDupServe(spark, root,
        docs.where(col("doc_id") % 5 === 0), asOf = Some(snap)).collect()
    }
    assert(e.getMessage.contains("snapshot expired"))
    val liveDirs = fs.listStatus(
        new org.apache.hadoop.fs.Path(root, "docs"))
      .map(_.getPath.getName).filter(_.startsWith("seg=")).sorted
    assert(liveDirs.length == 3, s"consumed dirs must be swept: $liveDirs")
    assert(served(root) == before)
  }

  test("tombstones keep masking the untouched segments; the merged rows drop physically; the full compaction still clears") {
    val root = tmpRoot("tailc_del")
    buildFiveSegs(root)
    val victims = docs.where(col("doc_id") % 5 =!= 0 &&
      col("doc_id") % 11 === 1).select(col("doc_id"))
    TextOps.minhashIndexDelete(spark, root, victims)
    val masked = served(root)

    assert(TextOps.minhashIndexCompactTail(spark, root,
      maxSegments = 2) == 4)
    // _dels must survive (the spared seed still holds victim rows)
    assert(EmbeddingOps.committedSegs(fs,
      new org.apache.hadoop.fs.Path(root, "_dels"))._1 >= 0,
      "tail compaction must NOT clear tombstones")
    assert(served(root) == masked)

    // and the full compaction composes on top, clearing them
    assert(TextOps.minhashIndexCompact(spark, root) > 0)
    assert(EmbeddingOps.committedSegs(fs,
      new org.apache.hadoop.fs.Path(root, "_dels"))._2.isEmpty,
      "the full compaction clears tombstones as before")
    assert(served(root) == masked)
  }

  test("kills at every crash window retry to the identical index; a racing append refuses at the commit") {
    val root = tmpRoot("tailc_kill")
    buildFiveSegs(root)
    val before = served(root)
    final class Kill extends RuntimeException
    Seq("tail-staged", "tail-renamed").foreach { window =>
      intercept[Kill] {
        TextOps.minhashIndexCompactTail(spark, root, maxSegments = 3,
          failpoint = t => if (t == window) throw new Kill)
      }
      assert(served(root) == before,
        s"serving must be unchanged after a kill at $window")
      assert(segsOf(root).size == 5,
        s"the manifest must be unchanged after a kill at $window")
    }
    assert(TextOps.minhashIndexCompactTail(spark, root,
      maxSegments = 3) == 3)
    assert(served(root) == before)

    // a concurrent append landing between the tail read and the
    // commit must refuse (committing would drop its segment)
    val root2 = tmpRoot("tailc_race")
    buildFiveSegs(root2)
    val e = intercept[IllegalArgumentException] {
      TextOps.minhashIndexCompactTail(spark, root2, maxSegments = 3,
        failpoint = t => if (t == "tail-renamed")
          TextOps.minhashIndexAppend(
            docs.where(col("doc_id") % 5 === 0 && col("doc_id") < 50),
            root2))
    }
    assert(e.getMessage.contains("concurrent writer"))
    // uncontended re-run applies everything (the racer's segment
    // survives in the manifest)
    assert(segsOf(root2).size == 6)
    assert(TextOps.minhashIndexCompactTail(spark, root2,
      maxSegments = 3) == 4)
    assert(segsOf(root2).size == 3)
  }

  test("continuous lifecycle: streamed ingest batches interleave with the standing maintenance policy, serving stays equal to the one-shot build throughout") {
    val stored = docs.where(col("doc_id") % 5 =!= 0).localCheckpoint()
    val slices = (0 until 6).map(i =>
      stored.where(col("doc_id") % 6 === i))
    val root = tmpRoot("tailc_life2")
    TextOps.minhashIndexWrite(slices(0), root)
    def fold(b: Long, batch: DataFrame): Unit =
      graft.streaming.Streams.indexIngestBatch(batch, b, root,
        "q-life", "docs")(
        (df, stamp) => TextOps.minhashIndexAppend(df, root,
          stamp = stamp))
    def serveNow(): Seq[String] = TextOps.nearDupServe(spark, root,
        docs.where(col("doc_id") % 5 === 0))
      .collect().map(_.toString).sorted.toSeq

    // ingest batches 0..4 with maintenance after every other batch —
    // the cadence a production pipeline schedules. Each maintenance
    // is the POLICY door: it tail-merges when over bound and the
    // ingest binding must ride every manifest change untouched
    (1 until 6).foreach { i =>
      fold(i - 1L, slices(i))
      if (i % 2 == 0)
        TextOps.minhashIndexMaintain(spark, root, maxSegments = 3)
    }
    assert(segsOf(root).size <= 4,
      s"maintenance must keep the chain bounded, got ${segsOf(root)}")

    val oneShot = tmpRoot("tailc_life2_ref")
    TextOps.minhashIndexWrite(stored, oneShot)
    assert(serveNow() == TextOps.nearDupServe(spark, oneShot,
        docs.where(col("doc_id") % 5 === 0))
      .collect().map(_.toString).sorted.toSeq,
      "interleaved ingest + maintenance must serve like the one-shot build")

    // a replayed ingest batch AFTER maintenance still no-ops (the
    // binding and high-water mark survived the tail commits)
    val segsAfter = segsOf(root)
    fold(2L, slices(3))
    assert(segsOf(root) == segsAfter,
      "replay protection must survive interleaved maintenance")
  }

  test("indexHealth reports the segment footprints and policy facts from driver metadata") {
    val root = tmpRoot("tailc_health")
    buildFiveSegs(root)
    TextOps.minhashIndexDelete(spark, root,
      docs.where(col("doc_id") % 31 === 1).select(col("doc_id")))
    graft.streaming.Streams.indexIngestBatch(
      docs.where(col("doc_id") % 5 === 0 && col("doc_id") < 40),
      0L, root, "q-health", "docs")(
      (df, stamp) => TextOps.minhashIndexAppend(df, root, stamp = stamp))

    val h = EmbeddingOps.indexHealth(spark, root, "docs").collect()
    assert(h.length == 6, "one row per committed segment")
    assert(h.forall(_.getLong(1) > 0), "every segment has bytes")
    assert(h.count(_.getBoolean(3)) == 1 &&
      h.filter(_.getBoolean(3)).head.getInt(0) ==
        h.map(_.getInt(0)).max,
      "exactly the newest segment is flagged")
    assert(h.head.getInt(4) == 1, "one tombstone segment reported")
    assert(!h.head.getBoolean(5), "no sweep pending")
    assert(h.head.getBoolean(6) && h.head.getLong(7) == 0L,
      "the ingest binding and high-water mark surface")
  }

  test("bm25 tail compaction recomputes the merged totals and dictionary; serving, prefix resolution, and the ivf/banded doors hold") {
    val root = tmpRoot("tailc_bm")
    val stored = docs.where(col("doc_id") % 5 =!= 0)
    TextOps.bm25IndexWrite(stored.where(col("doc_id") % 7 < 3), root)
    (3 until 7).foreach(i => TextOps.bm25IndexAppend(
      stored.where(col("doc_id") % 7 === i), root))
    def top(p: String) = TextOps.bm25TopKIndexed(spark, p,
        Seq("join", "vector", "filter"))
      .collect().map(_.toString).sorted.toSeq
    val before = top(root)
    val vocabBefore = TextOps.termsMatchingPrefix(spark, root, "s")

    assert(TextOps.bm25IndexCompactTail(spark, root,
      maxSegments = 2) == 4)
    assert(segsOf(root).size == 2)
    assert(top(root) == before,
      "bm25 serving (totals included) must be identical")
    assert(TextOps.termsMatchingPrefix(spark, root, "s") == vocabBefore,
      "the merged segment's dictionary must regenerate")

    // positional roots: `ps` rides the tail rewrite (schema comes
    // from the stored files), so phrase serving is unchanged
    val posRoot = tmpRoot("tailc_pos")
    TextOps.bm25IndexWrite(stored.where(col("doc_id") % 7 < 3),
      posRoot, positional = true)
    (3 until 7).foreach(i => TextOps.bm25IndexAppend(
      stored.where(col("doc_id") % 7 === i), posRoot))
    def phrase(p: String) = TextOps.phraseOccurrencesIndexed(spark, p,
        Seq("order", "fast"))
      .collect().map(_.toString).sorted.toSeq
    val phraseBefore = phrase(posRoot)
    assert(phraseBefore.nonEmpty, "fixture phrase must match")
    assert(TextOps.bm25IndexCompactTail(spark, posRoot,
      maxSegments = 2) == 4)
    assert(phrase(posRoot) == phraseBefore,
      "positional postings must survive the tail rewrite")

    // the standing policy: over-bound takes the tail door, a pending
    // forget sweep forces the full rewrite (at-rest deletion owed),
    // an in-bound clean root does nothing
    val pRoot = tmpRoot("tailc_pol")
    buildFiveSegs(pRoot)
    assert(TextOps.minhashIndexMaintain(spark, pRoot,
      maxSegments = 3) == "tail:3")
    assert(TextOps.minhashIndexMaintain(spark, pRoot,
      maxSegments = 3) == "none")
    import spark.implicits._
    TextOps.minhashIndexDelete(spark, pRoot, Seq(11L).toDF("doc_id"))
    EmbeddingOps.snapshotInvalidate(spark, pRoot)
    // a DIRECT tail call on the swept root refuses — tail compaction
    // would park forgotten payload in consumed dirs and let the
    // sweep-phase epoch bump outrun the _swept stamp (the next full
    // compaction would then retire, not delete). Forgetting outranks
    // segment hygiene; the policy door routes to the full rewrite.
    val eSw = intercept[IllegalArgumentException] {
      TextOps.minhashIndexCompactTail(spark, pRoot, maxSegments = 1)
    }
    assert(eSw.getMessage.contains("pending forget sweep"))
    val ran = TextOps.minhashIndexMaintain(spark, pRoot, maxSegments = 3)
    assert(ran.startsWith("full:"), s"swept root must full-compact: $ran")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(pRoot, "_swept")),
      "the full rewrite consumed the sweep stamp")

    // ivf door smoke: five segments bound to three, serving equal
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings
    val ivfRoot = tmpRoot("tailc_ivf")
    EmbeddingOps.ivfIndexWrite(emb.where(col("vec_id") % 7 < 3), ivfRoot)
    (3 until 7).foreach(i => EmbeddingOps.ivfIndexAppend(
      emb.where(col("vec_id") % 7 === i), ivfRoot))
    def nn(p: String) = EmbeddingOps.ivfTopKIndexed(spark, p,
        emb.where(col("vec_id") < 5))
      .collect().map(_.toString).sorted.toSeq
    val nnBefore = nn(ivfRoot)
    assert(EmbeddingOps.ivfIndexCompactTail(spark, ivfRoot,
      maxSegments = 3) == 3)
    assert(nn(ivfRoot) == nnBefore)
  }

  test("the manifest commit is a CAS: a generation committed first by a " +
    "racer makes the second committer abort, never clobber") {
    // the TOCTOU the genNow re-check alone cannot close: an append
    // committing between the re-check and the compactor's commitGen
    // used to be silently overwritten (delete-dest + rename is
    // last-writer-wins), orphaning the appended segment for the next
    // sweep. The commit itself is now a no-overwrite rename.
    val root = tmpRoot("tailc_cas")
    TextOps.minhashIndexWrite(docs.where(col("doc_id") % 5 =!= 0), root)
    val metaDir = new org.apache.hadoop.fs.Path(root, "_segs")
    val (gen, segs) = EmbeddingOps.committedSegs(fs, metaDir)
    // the racer (an append) wins generation gen+1 first...
    EmbeddingOps.commitGen(fs, metaDir, gen + 1, segs :+ 77)
    // ...so the loser's commit of the SAME generation must abort
    val e = intercept[IllegalStateException] {
      EmbeddingOps.commitGen(fs, metaDir, gen + 1, segs :+ 88)
    }
    assert(e.getMessage.contains("concurrent writer"))
    // the winner's manifest survives byte-for-byte: its listing (and
    // hence its segment) is still what readers resolve
    assert(EmbeddingOps.committedSegs(fs, metaDir) ==
      ((gen + 1, segs :+ 77)),
      "the losing committer clobbered the winner's manifest")
    // staging-tree commits opt OUT (a resumed merge assembly
    // re-writes its gen-0): overwrite = true keeps them idempotent
    EmbeddingOps.commitGen(fs, metaDir, gen + 1, segs :+ 99,
      overwrite = true)
    assert(EmbeddingOps.committedSegs(fs, metaDir) ==
      ((gen + 1, segs :+ 99)))
    // a CRASHED commit's orphan staging file (unique per writer, so
    // racers can never clobber each other's staged listing) neither
    // blocks later commits nor confuses the manifest reader
    fs.create(new org.apache.hadoop.fs.Path(metaDir,
      s".gen-${gen + 2}.tmp-deadbeef"), false).close()
    EmbeddingOps.commitGen(fs, metaDir, gen + 2, segs :+ 100)
    assert(EmbeddingOps.committedSegs(fs, metaDir) ==
      ((gen + 2, segs :+ 100)))
  }

  test("the full-compaction turn sweeps STALE orphan staging tmps " +
    "and spares fresh ones") {
    // a crashed commitGen leaves its unique .gen-N.tmp-<uuid> behind;
    // commitGen itself must never clean them (deleting a live racer's
    // staged listing is the clobber the unique names prevent), so the
    // full door garbage-collects them — age-gated: a FRESH tmp could
    // be an in-flight commit from a contract violation, and sweeping
    // it would convert that violation's loud CAS abort into the
    // silent clobber. The no-op door turn is where the sweep earns
    // its keep (a real compaction swaps the whole tree anyway).
    val root = tmpRoot("tmpsweep")
    TextOps.minhashIndexWrite(docs.where(col("doc_id") % 5 =!= 0), root)
    val metaDir = new org.apache.hadoop.fs.Path(root, "_segs")
    def plant(name: String, ageMs: Long): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(metaDir, name)
      val out = fs.create(p, false)
      try out.write("7".getBytes("UTF-8")) finally out.close()
      fs.setTimes(p, System.currentTimeMillis() - ageMs, -1)
      p
    }
    val stale = plant(".gen-7.tmp-stale-crash", 2 * 3600 * 1000L)
    val fresh = plant(".gen-7.tmp-fresh-writer", 0L)
    assert(TextOps.minhashIndexCompact(spark, root) == 0,
      "a single-segment root with no tombstones is the no-op turn")
    assert(!fs.exists(stale), "the stale orphan must be swept")
    assert(fs.exists(fresh), "a fresh tmp must survive (it could be " +
      "an in-flight commit)")
    // the manifest itself is untouched and the root still serves
    assert(segsOf(root) == Seq(0))
    assert(served(root).nonEmpty)
  }
}
