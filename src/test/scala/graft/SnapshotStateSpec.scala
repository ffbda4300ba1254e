package graft

import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingOps, Forget, TextOps}

/** Model-based check of the snapshot/retention/forget state machine
  * over a persisted index's whole mutation lifecycle. The model is
  * three variables — the current epoch, the (at most one) retained
  * epoch, and each token's capture-time serve — and the contract is
  * total: after EVERY mutation, EVERY token ever captured must either
  * replay its recorded rows bit-identically (its epoch is live, or
  * retained and unswept) or refuse with the loud message. No third
  * outcome exists: a pinned read never silently serves a different
  * incarnation.
  *
  * Transition rules under test (the [[EmbeddingOps]] segment
  * protocol): append/delete leave the epoch and every pinned view
  * intact; a compaction bumps the epoch and RETAINS exactly the
  * replaced epoch (older retained trees prune) — UNLESS it is the
  * first compaction after a forget sweep, in which case the replaced
  * tree (which still physically holds the tombstone-masked forgotten
  * payload) is DELETED, not retained; a forget sweep bumps the epoch
  * and prunes ALL retained trees (a forgotten payload must not be
  * servable — or persist at rest — through the retention grace). */
class SnapshotStateSpec extends SparkSpec {

  test("every token ever captured either replays exactly or refuses, " +
    "through appends, deletes, compactions, and forget sweeps") {
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .where(col("doc_id") < 120).localCheckpoint()
    val probe = all.select((col("doc_id") + 500000L).as("doc_id"),
      col("text")).localCheckpoint()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_snap_machine").resolve("ix").toString
    TextOps.minhashIndexWrite(all.where(col("doc_id") % 4 === 0), idx)

    // the model: current epoch, the retained epoch (at most one),
    // whether a sweep has run since the last compaction (the next
    // compaction then prunes instead of retiring), and per-token
    // recorded rows
    var epoch = 1L // first publish of a fresh root writes epoch 1
    var retained: Option[Long] = None
    var swept = false
    var tokens = Seq.empty[(graft.operators.IndexSnapshot, Long,
      Array[String], String)]

    def serveNow(asOf: Option[graft.operators.IndexSnapshot])
        : Array[String] =
      TextOps.nearDupServe(spark, idx, probe, asOf = asOf)
        .collect().map(_.toString).sorted

    def capture(tag: String): Unit = {
      val snap = EmbeddingOps.indexSnapshot(spark, idx)
      assert(snap.epoch == epoch,
        s"[$tag] model epoch $epoch but root says ${snap.epoch}")
      tokens :+= ((snap, epoch, serveNow(Some(snap)), tag))
    }

    def checkAll(after: String): Unit = tokens.foreach {
      case (snap, tokEpoch, recorded, tag) =>
        val liveOrRetained =
          tokEpoch == epoch || retained.contains(tokEpoch)
        if (liveOrRetained) {
          val got = serveNow(Some(snap))
          assert(got.sameElements(recorded),
            s"after $after: token '$tag' (epoch $tokEpoch) drifted " +
              s"from its capture-time rows (model: live=$epoch, " +
              s"retained=$retained)")
        } else {
          val e = intercept[IllegalArgumentException] {
            serveNow(Some(snap))
          }
          assert(e.getMessage.contains("snapshot expired"),
            s"after $after: token '$tag' (epoch $tokEpoch) must " +
              s"refuse loudly, got: ${e.getMessage}")
        }
    }

    def append(pred: org.apache.spark.sql.Column, tag: String): Unit = {
      TextOps.minhashIndexAppend(all.where(pred), idx)
      checkAll(s"append $tag")
    }
    def delete(pred: org.apache.spark.sql.Column, tag: String): Unit = {
      TextOps.minhashIndexDelete(spark, idx,
        all.where(pred).select(col("doc_id")))
      checkAll(s"delete $tag")
    }
    def compact(tag: String): Unit = {
      assert(TextOps.minhashIndexCompact(spark, idx) >= 1,
        s"[$tag] compaction must be real for the model to advance")
      // the first compaction after a sweep deletes the replaced tree
      // (it still holds the masked forgotten payload) — no retention
      retained = if (swept) None else Some(epoch)
      swept = false; epoch += 1
      checkAll(s"compact $tag")
    }
    def forget(pred: org.apache.spark.sql.Column, tag: String): Unit = {
      Forget.forgetDocs(spark, Seq(Forget.IndexTarget(idx)),
        all.where(pred).select(col("doc_id"), col("text")))
      retained = None; swept = true; epoch += 1
      checkAll(s"forget $tag")
    }

    // the scripted lifecycle: every transition class, interleaved
    capture("t0-at-build")
    append(col("doc_id") % 4 === 1, "slice1")
    capture("t1-post-append")
    delete(col("doc_id") % 8 === 0, "eighths")
    capture("t2-post-delete")
    compact("c1") // t0-t2 ride the retention grace; epoch 1 retained
    capture("t3-post-compact")
    append(col("doc_id") % 4 === 2, "slice2")
    capture("t4-second-epoch")
    compact("c2") // epoch 2 retained; t0-t2 (epoch 1) now refuse
    capture("t5-third-epoch")
    forget(col("doc_id") % 6 === 0, "sweep") // ALL pinned views die
    capture("t6-post-forget")
    append(col("doc_id") % 4 === 3, "slice3")
    delete(col("doc_id") % 9 === 1, "ninths")
    compact("c3") // FIRST post-sweep compaction: prunes, never
    // retires — t6 refuses (forgetting outranks the grace) and the
    // masked forgotten payload leaves the disk entirely
    capture("t7-post-sweep-compact")
    append(col("doc_id") % 8 === 3, "slice4")
    compact("c4") // the grace is restored after the swept compaction
    capture("t8-final")
    checkAll("final state")

    // model sanity: exactly the expected liveness split at the end —
    // t7 rides c4's restored retention, t8 is live; everything
    // earlier (t6 included: its epoch was swept-then-pruned) refuses
    val alive = tokens.count { case (_, te, _, _) =>
      te == epoch || retained.contains(te) }
    assert(alive == 2,
      s"expected exactly 2 serveable tokens at the end, got $alive")

    // the at-rest half of the forget guarantee, checked physically:
    // c3 (the first post-sweep compaction) must have deleted the
    // replaced tree rather than retiring it, so at no point after c3
    // did any retired sibling hold the pre-sweep payload. By the end
    // exactly c4's retirement exists — epoch of t7's capture.
    val root = new org.apache.hadoop.fs.Path(idx)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retiredOnDisk = fs.listStatus(root.getParent).map(_.getPath.getName)
      .filter(_.startsWith(s".${root.getName}.epoch-")).toSeq
    assert(retiredOnDisk == Seq(s".${root.getName}.epoch-${epoch - 1}"),
      s"expected exactly the c4 retirement on disk, got $retiredOnDisk")
  }

  test("a corrupt epoch marker refuses with the repair instruction " +
    "instead of NFE-bricking every reader") {
    // the pre-r16 crash window: an in-place _epoch overwrite could be
    // seen empty/partial mid-write and threw a bare
    // NumberFormatException from every subsequent read. Writers now
    // publish markers by stage+rename, so a corrupt marker can only
    // be a crashed LEGACY write — readers must say so and name the
    // repair, not stack-trace
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .where(col("doc_id") < 40).localCheckpoint()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_snap_badmark").resolve("ix").toString
    TextOps.minhashIndexWrite(all, idx)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(idx, "_epoch"), "".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      EmbeddingOps.indexSnapshot(spark, idx)
    }
    assert(e.getMessage.contains("unreadable marker") &&
        e.getMessage.contains("repair"),
      s"expected the loud marker refusal, got: ${e.getMessage}")
  }

  test("setRetention widens the replay-guarantee window to n " +
    "compactions, keeps disk bounded at n retired trees, and 0 " +
    "disables the grace") {
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .where(col("doc_id") < 100).localCheckpoint()
    val probe = all.select((col("doc_id") + 700000L).as("doc_id"),
      col("text")).localCheckpoint()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_snap_retain").resolve("ix").toString
    TextOps.minhashIndexWrite(all.where(col("doc_id") % 4 === 0), idx)
    val root = new org.apache.hadoop.fs.Path(idx)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def retiredCount(): Int =
      fs.listStatus(root.getParent).map(_.getPath.getName)
        .count(_.startsWith(s".${root.getName}.epoch-"))
    def serve(snap: graft.operators.IndexSnapshot): Array[String] =
      TextOps.nearDupServe(spark, idx, probe, asOf = Some(snap))
        .collect().map(_.toString).sorted
    // the knob refuses out-of-bound depths: retention must stay a
    // declared disk bound, not a leak
    assertThrows[IllegalArgumentException](
      EmbeddingOps.setRetention(spark, idx,
        EmbeddingOps.MaxRetainEpochs + 1))
    assertThrows[IllegalArgumentException](
      EmbeddingOps.setRetention(spark, idx, -1))

    EmbeddingOps.setRetention(spark, idx, 2)
    TextOps.minhashIndexAppend(all.where(col("doc_id") % 4 === 1), idx)
    val tok1 = EmbeddingOps.indexSnapshot(spark, idx)
    val rows1 = serve(tok1)
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1) // c1
    TextOps.minhashIndexAppend(all.where(col("doc_id") % 4 === 2), idx)
    val tok2 = EmbeddingOps.indexSnapshot(spark, idx)
    val rows2 = serve(tok2)
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1) // c2
    // two compactions deep: tok1 (2 epochs back) still replays
    assert(serve(tok1).sameElements(rows1),
      "retainEpochs=2 must keep a token alive through TWO compactions")
    assert(serve(tok2).sameElements(rows2))
    assert(retiredCount() == 2, s"disk bound: got ${retiredCount()}")
    // the knob survives the swaps it rode through
    assert(EmbeddingOps.retentionOf(fs, root) == 2,
      "_retain must be carried into every published tree")
    TextOps.minhashIndexAppend(all.where(col("doc_id") % 4 === 3), idx)
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1) // c3
    // three deep: tok1 is past the window and refuses; tok2 lives
    val e = intercept[IllegalArgumentException](serve(tok1))
    assert(e.getMessage.contains("snapshot expired"))
    assert(serve(tok2).sameElements(rows2))
    assert(retiredCount() == 2, "prune must hold the declared bound")

    // retention 0: the swap deletes the replaced tree and prunes all
    // retired ones — any expired token refuses immediately
    EmbeddingOps.setRetention(spark, idx, 0)
    TextOps.minhashIndexDelete(spark, idx,
      spark.range(3L).select(col("id").as("doc_id")))
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1) // c4
    assert(retiredCount() == 0,
      "retainEpochs=0 must leave no retired trees at all")
    assertThrows[IllegalArgumentException](serve(tok2))
  }

  test("withSnapshotRetry absorbs ONE swap landing between plan " +
    "construction and execution — the retry serves the capture-time " +
    "rows from the retired tree; unrelated errors propagate untouched") {
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .where(col("doc_id") < 80).localCheckpoint()
    val probe = all.select((col("doc_id") + 800000L).as("doc_id"),
      col("text")).localCheckpoint()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_snap_retry").resolve("ix").toString
    TextOps.minhashIndexWrite(all.where(col("doc_id") % 2 === 0), idx)
    TextOps.minhashIndexAppend(all.where(col("doc_id") % 2 =!= 0), idx)
    val snap = EmbeddingOps.indexSnapshot(spark, idx)
    val recorded = TextOps.nearDupServe(spark, idx, probe,
      asOf = Some(snap)).collect().map(_.toString).sorted

    // the race, injected for real: the thunk plans against the LIVE
    // root (the token is current), then a compaction swaps the tree
    // away before the collect — the documented mid-scan death. The
    // retry re-plans, resolves to the retired tree, and completes
    // with the capture-time rows, no caller intervention.
    var attempts = 0
    val rows = EmbeddingOps.withSnapshotRetry { () =>
      attempts += 1
      val df = TextOps.nearDupServe(spark, idx, probe,
        asOf = Some(snap))
      if (attempts == 1)
        assert(TextOps.minhashIndexCompact(spark, idx) >= 1,
          "the injected swap must be real")
      df.collect()
    }
    assert(attempts == 2,
      "the first attempt must die on the moved files and be retried")
    assert(rows.map(_.toString).sorted.sameElements(recorded),
      "the retry must serve the capture-time rows byte-identically")

    // an error outside the missing-file class is NOT retried
    var boomCalls = 0
    val boom = intercept[RuntimeException] {
      EmbeddingOps.withSnapshotRetry[Unit] { () =>
        boomCalls += 1
        throw new RuntimeException("boom")
      }
    }
    assert(boom.getMessage == "boom" && boomCalls == 1,
      "withSnapshotRetry must not absorb unrelated failures")
  }

  test("a crash between the pre-swap prune and the swap can only " +
    "COST grace early — never exceed the retention bound, never a " +
    "wrong answer — and the retried compaction completes normally") {
    // the other crash window retention has: publishStaged prunes
    // retired trees down to budget BEFORE the swap (so no interleaving
    // can leave more than retainEpochs of them), which means a kill
    // right after the prune leaves the LIVE tree untouched but the
    // previously-retired epoch already gone
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .where(col("doc_id") < 80).localCheckpoint()
    val probe = all.select((col("doc_id") + 900000L).as("doc_id"),
      col("text")).localCheckpoint()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_snap_prunecrash").resolve("ix")
      .toString
    TextOps.minhashIndexWrite(all.where(col("doc_id") % 2 === 0), idx)
    val t0 = EmbeddingOps.indexSnapshot(spark, idx) // epoch 1
    TextOps.minhashIndexAppend(all.where(col("doc_id") % 2 =!= 0), idx)
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1) // c1
    val rows0 = TextOps.nearDupServe(spark, idx, probe,
      asOf = Some(t0)).collect().map(_.toString).sorted // via retired
    assert(rows0.nonEmpty)
    val t1 = EmbeddingOps.indexSnapshot(spark, idx) // epoch 2, live
    val live1 = TextOps.nearDupServe(spark, idx, probe,
      asOf = Some(t1)).collect().map(_.toString).sorted
    TextOps.minhashIndexAppend(
      all.where(col("doc_id") % 4 === 1), idx)
    intercept[RuntimeException] {
      TextOps.minhashIndexCompact(spark, idx,
        failpoint = fp => if (fp == "pruned")
          throw new RuntimeException("kill@pruned"))
    }
    // the live tree is untouched (the swap never ran): t1 still
    // serves its live view
    assert(TextOps.nearDupServe(spark, idx, probe, asOf = Some(t1))
      .collect().map(_.toString).sorted.sameElements(live1),
      "a pre-swap crash must leave the live incarnation intact")
    // t0's grace was the crash's only casualty: loud refusal, and at
    // most retainEpochs (= 1) retired trees exist at every instant
    val e = intercept[IllegalArgumentException] {
      TextOps.nearDupServe(spark, idx, probe, asOf = Some(t0)).count()
    }
    assert(e.getMessage.contains("snapshot expired"))
    val root = new org.apache.hadoop.fs.Path(idx)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(root.getParent).map(_.getPath.getName)
      .count(_.startsWith(s".${root.getName}.epoch-")) == 0,
      "the crashed run must not leave retired trees past the budget")
    // the retry completes: epoch advances, t1 rides the grace
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1)
    assert(TextOps.nearDupServe(spark, idx, probe, asOf = Some(t1))
      .collect().map(_.toString).sorted.sameElements(live1),
      "after the healed retry, the pre-crash live token must ride " +
        "the restored retention grace")
  }

  test("a crash between the publish rename and the retire rename " +
    "degrades retention to the loud refusal — never a wrong answer — " +
    "and the next swap sweeps the stale aside copy") {
    // the one crash window retention adds to the swap: the new tree
    // is LIVE but the replaced one sits at `.prev` instead of its
    // retired name. The grace is best-effort by contract: the
    // pre-compaction token must REFUSE (no retired tree to resolve),
    // the live serve must be the compacted view, and the next real
    // swap must clean the leftover.
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .where(col("doc_id") < 80).localCheckpoint()
    val probe = all.select((col("doc_id") + 600000L).as("doc_id"),
      col("text"))
    val idx = java.nio.file.Files
      .createTempDirectory("graft_snap_crash").resolve("ix").toString
    TextOps.minhashIndexWrite(all.where(col("doc_id") % 2 === 0), idx)
    val snap = EmbeddingOps.indexSnapshot(spark, idx)
    TextOps.minhashIndexAppend(all.where(col("doc_id") % 2 =!= 0), idx)
    val liveRows = TextOps.nearDupServe(spark, idx, probe)
      .collect().map(_.toString).sorted
    intercept[RuntimeException] {
      TextOps.minhashIndexCompact(spark, idx,
        failpoint = fp => if (fp == "published")
          throw new RuntimeException("kill@published"))
    }
    val root = new org.apache.hadoop.fs.Path(idx)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + ".prev")
    assert(fs.exists(prev), "the kill window must leave .prev behind")
    // (a) the live serve is the compacted view, identical rows
    assert(TextOps.nearDupServe(spark, idx, probe)
      .collect().map(_.toString).sorted.sameElements(liveRows))
    // (b) the pre-compaction token refuses loudly (retention was the
    // casualty of the crash, correctness was not)
    val e = intercept[IllegalArgumentException] {
      TextOps.nearDupServe(spark, idx, probe, asOf = Some(snap))
        .count()
    }
    assert(e.getMessage.contains("snapshot expired"))
    // (c) the next real swap sweeps the stale aside copy and retires
    // properly: its own pre-swap token rides the grace
    TextOps.minhashIndexDelete(spark, idx,
      spark.range(2L).select(col("id").as("doc_id")))
    val snap2 = EmbeddingOps.indexSnapshot(spark, idx)
    val at2 = TextOps.nearDupServe(spark, idx, probe,
      asOf = Some(snap2)).collect().map(_.toString).sorted
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1)
    assert(!fs.exists(prev),
      "the next swap must sweep the crashed aside copy")
    assert(TextOps.nearDupServe(spark, idx, probe, asOf = Some(snap2))
      .collect().map(_.toString).sorted.sameElements(at2),
      "the post-crash swap must retire normally (grace restored)")
  }

  test("generation fencing: a compaction racing a concurrent append " +
    "or delete refuses loudly at publish instead of silently " +
    "dropping the other writer's commit") {
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .where(col("doc_id") < 120).localCheckpoint()
    val probe = all.select((col("doc_id") + 800000L).as("doc_id"),
      col("text")).localCheckpoint()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_snap_fence").resolve("ix").toString
    TextOps.minhashIndexWrite(all.where(col("doc_id") % 3 === 0), idx)
    TextOps.minhashIndexAppend(all.where(col("doc_id") % 3 === 1), idx)

    // writer B lands an APPEND inside writer A's publish window (the
    // staged-written failpoint fires after A staged its rewrite of
    // the OLD view) — the pre-swap fence re-read must catch the moved
    // _segs generation and refuse
    var appended = false
    val eA = intercept[IllegalArgumentException] {
      TextOps.minhashIndexCompact(spark, idx, failpoint = {
        case "staged-written" if !appended =>
          appended = true
          TextOps.minhashIndexAppend(all.where(col("doc_id") % 3 === 2),
            idx)
        case _ => ()
      })
    }
    assert(eA.getMessage.contains("concurrent writer detected") &&
        eA.getMessage.contains("_segs"),
      s"expected the fence refusal naming _segs, got: ${eA.getMessage}")
    // the loser refused, the winner's commit is intact: the serve
    // sees ALL three slices (equal to a fresh full build)
    val fullIdx = java.nio.file.Files
      .createTempDirectory("graft_snap_fence_full").resolve("ix")
      .toString
    TextOps.minhashIndexWrite(all, fullIdx)
    assert(TextOps.nearDupServe(spark, idx, probe)
      .collect().map(_.toString).sorted.sameElements(
        TextOps.nearDupServe(spark, fullIdx, probe)
          .collect().map(_.toString).sorted),
      "the refused publish must not have dropped the racing append")

    // writer B lands a DELETE mid-publish: the _dels fence catches it
    // (a swap would CLEAR tombstones the staged tree never saw)
    var deleted = false
    val eD = intercept[IllegalArgumentException] {
      TextOps.minhashIndexCompact(spark, idx, failpoint = {
        case "staged-written" if !deleted =>
          deleted = true
          TextOps.minhashIndexDelete(spark, idx,
            all.where(col("doc_id") % 5 === 0).select(col("doc_id")))
        case _ => ()
      })
    }
    assert(eD.getMessage.contains("concurrent writer detected") &&
        eD.getMessage.contains("_dels"),
      s"expected the fence refusal naming _dels, got: ${eD.getMessage}")
    // the racing delete is live (tombstones mask immediately)...
    val masked = TextOps.nearDupServe(spark, idx, probe).collect()
    assert(!masked.exists(_.getLong(0) % 5 === 0),
      "the racing delete's tombstones must mask the serve")
    // ...and an uncontended re-run compacts cleanly, applying it
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1)
    assert(!TextOps.nearDupServe(spark, idx, probe).collect()
      .exists(_.getLong(0) % 5 === 0))
  }

  test("a malformed _retain marker refuses with the repair message " +
    "instead of silently disabling retention") {
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .where(col("doc_id") < 40).localCheckpoint()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_snap_badretain").resolve("ix")
      .toString
    TextOps.minhashIndexWrite(all.where(col("doc_id") % 2 === 0), idx)
    TextOps.minhashIndexAppend(all.where(col("doc_id") % 2 =!= 0), idx)
    // a hand-edited value past the cap parses as a Long but would
    // truncate to a wrong (possibly NEGATIVE) Int — negative retain
    // silently disables the grace AND makes pruneRetired keep
    // everything; the reader must refuse like every malformed marker
    java.nio.file.Files.write(
      java.nio.file.Paths.get(idx, "_retain"),
      "123456789012".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      TextOps.minhashIndexCompact(spark, idx)
    }
    assert(e.getMessage.contains("retainEpochs must be in") &&
        e.getMessage.contains("repair"),
      s"expected the retain-range refusal, got: ${e.getMessage}")
    // repair and the compaction completes
    java.nio.file.Files.write(
      java.nio.file.Paths.get(idx, "_retain"), "1".getBytes("UTF-8"))
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1)
  }

  test("a sweep crash between the _swept and _epoch marker writes " +
    "fails SAFE: the next compaction over-deletes (prunes the " +
    "replaced tree) instead of retaining forgotten payload at rest") {
    val all = Tables(spark, "/root/testdata/sf0.001").documents.toDF()
      .where(col("doc_id") < 80).localCheckpoint()
    val probe = all.select((col("doc_id") + 850000L).as("doc_id"),
      col("text")).localCheckpoint()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_snap_sweptcrash").resolve("ix")
      .toString
    TextOps.minhashIndexWrite(all.where(col("doc_id") % 2 === 0), idx)
    TextOps.minhashIndexAppend(all.where(col("doc_id") % 2 =!= 0), idx)
    val snap = EmbeddingOps.indexSnapshot(spark, idx) // epoch 1
    // simulate the crash state snapshotInvalidate can now leave:
    // _swept landed (it writes FIRST), _epoch did not — tokens are
    // still live, but the sweep's at-rest promise is already made
    java.nio.file.Files.write(
      java.nio.file.Paths.get(idx, "_swept"), "2".getBytes("UTF-8"))
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1)
    val root = new org.apache.hadoop.fs.Path(idx)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retired = fs.listStatus(root.getParent).map(_.getPath.getName)
      .filter(_.startsWith("." + root.getName + ".epoch-"))
    assert(retired.isEmpty,
      "the post-crash compaction must PRUNE the replaced tree " +
        s"(found retired: ${retired.mkString(", ")}) — a retained " +
        "copy would hold the payload the interrupted sweep promised " +
        "to remove at rest")
    // the grace was the casualty, never correctness: the pre-sweep
    // token refuses loudly
    val e = intercept[IllegalArgumentException] {
      TextOps.nearDupServe(spark, idx, probe, asOf = Some(snap)).count()
    }
    assert(e.getMessage.contains("snapshot expired"))
  }
}
