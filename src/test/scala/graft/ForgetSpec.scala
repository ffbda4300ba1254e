package graft

import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingOps, Forget, TextOps}
import graft.streaming.Streams

/** The right-to-be-forgotten sweep ([[Forget.forgetDocs]]): one call
  * must remove a doc set from a persisted near-dup index, a streaming
  * registry state, and an additive model state — each verified by its
  * own serving path afterwards — and a failing target must not block
  * the others while still failing the sweep loudly. */
class ForgetSpec extends SparkSpec {

  private def foldState(sink: (org.apache.spark.sql.DataFrame, String,
        String) => org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row],
      corpus: org.apache.spark.sql.DataFrame, tag: String): String = {
    val streamDir = java.nio.file.Files
      .createTempDirectory(s"graft_forget_${tag}_in")
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft_forget_${tag}_ck").toString
    val statePath = java.nio.file.Files
      .createTempDirectory(s"graft_forget_${tag}_st")
      .resolve("st").toString
    corpus.coalesce(1).write.mode("append").parquet(streamDir.toString)
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    val q = sink(stream, statePath, ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), s"$tag stream did not finish")
    statePath
  }

  test("one sweep call forgets a doc set across index, registry, and " +
    "additive state; every serving path stops seeing them") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
      .where($"doc_id" < 80).localCheckpoint()
    val victims = docs.where($"doc_id" % 9 === 0).localCheckpoint()
    val survivors = docs.where($"doc_id" % 9 =!= 0)

    val idx = java.nio.file.Files
      .createTempDirectory("graft_forget_idx").toString
    TextOps.minhashIndexWrite(docs, idx)
    val regState = foldState(Streams.minhashSink(_, _, _), docs, "reg")
    val lmState = foldState(Streams.lmSink(_, _, _), docs, "lm")
    // a vector index joins the sweep through its own key column (the
    // payload rows carry vec_id = doc_id for the docs' embeddings)
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .where($"vec_id" < 80).localCheckpoint()
    val vIdx = java.nio.file.Files
      .createTempDirectory("graft_forget_vidx").toString
    EmbeddingOps.ivfIndexWrite(emb, vIdx)
    val victimsWithVec = victims.withColumn("vec_id", $"doc_id")
    // the image near-dup index joins the sweep unchanged — it is the
    // same doc_id-keyed segment protocol under a different payload
    val pIdx = java.nio.file.Files
      .createTempDirectory("graft_forget_pidx").resolve("ix").toString
    val media = graft.operators.Multimodal.syntheticPngMedia(docs)
    graft.operators.Multimodal.phashIndexWrite(media, pIdx)

    val report = Forget.forgetDocs(spark, Seq(
        Forget.IndexTarget(idx),
        Forget.IndexTarget(vIdx, keyCol = "vec_id"),
        Forget.IndexTarget(pIdx),
        Forget.RegistryStateTarget(regState),
        Forget.AdditiveStateTarget(lmState, "lm")),
      victimsWithVec)
    assert(report.where($"status" === "deleted").count() === 5L)
    // image serving: forgotten images never answer (probe with the
    // victims' own payloads — each would match its indexed self)
    val pProbe = media.where($"doc_id" % 9 === 0)
      .select(($"doc_id" + 100000L).as("doc_id"), $"media_type",
        $"payload")
    assert(graft.operators.Multimodal.phashNearDupServe(spark, pIdx,
        pProbe)
      .where($"doc_a" % 9 === 0).count() === 0L)
    // vector serving: tombstoned vecs never answer
    val vServed = EmbeddingOps.ivfTopKIndexed(spark, vIdx,
      emb.where($"vec_id" < 5))
    val vVictims = victimsWithVec.select($"vec_id").as[Long]
      .collect().toSet
    assert(vServed.where($"vec_id".isin(vVictims.toSeq: _*))
      .count() === 0L)

    // index serving: tombstoned docs never answer (serve a batch of
    // the victims' own text — without the tombstones each would match
    // its indexed self-content cluster)
    val probeBatch = victims.select(($"doc_id" + 100000L).as("doc_id"),
      $"text")
    val served = TextOps.nearDupServe(spark, idx, probeBatch)
    val victimIds = victims.select($"doc_id").as[Long].collect().toSet
    assert(served.where($"doc_a".isin(victimIds.toSeq: _*)).count() === 0L)
    // registry state: masked at read
    assert(Streams.foldState(spark, regState)
      .where($"doc_id".isin(victimIds.toSeq: _*)).count() === 0L)
    // additive state: exact subtraction — equals a fresh fold over
    // the survivors
    val freshLm = foldState(Streams.lmSink(_, _, _), survivors, "lmf")
    assert(Streams.foldState(spark, lmState)
      .collect().map(_.toString).sorted.sameElements(
        Streams.foldState(spark, freshLm)
          .collect().map(_.toString).sorted))
  }

  test("forget-ledger arms the front door: forget -> compact -> " +
    "re-ingest a byte-identical doc -> filtered before any artifact " +
    "touch; a missing ledger refuses loudly") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
      .where($"doc_id" < 40).localCheckpoint()
    val victims = docs.where($"doc_id" % 5 === 0).localCheckpoint()
    val victimIds = victims.select($"doc_id").as[Long].collect().toSet

    val idx = java.nio.file.Files
      .createTempDirectory("graft_forget_idx3").toString
    TextOps.minhashIndexWrite(docs, idx)
    val ledger = java.nio.file.Files
      .createTempDirectory("graft_forget_ledger").resolve("lg").toString
    // an uninitialized ledger path must refuse, never silently admit
    val e0 = intercept[IllegalArgumentException] {
      Forget.forgottenFilter(docs, ledger)
    }
    assert(e0.getMessage.contains("ledgerInit"))
    Forget.ledgerInit(spark, ledger)
    // nothing forgotten yet: the filter is a pass-through
    assert(Forget.forgottenFilter(docs, ledger).count() === docs.count())

    // one sweep deletes from the index AND arms the ledger
    val report = Forget.forgetDocs(spark, Seq(
        Forget.IndexTarget(idx),
        Forget.LedgerTarget(ledger)),
      victims)
    assert(report.where($"status" === "deleted").count() === 2L)
    assert(report.where($"target_kind" === "ledger").count() === 1L)

    // compaction applies + CLEARS the index tombstones — the exact
    // window where re-ingestion used to resurrect a forgotten doc
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1)
    assert(EmbeddingOps.tombstones(spark, idx, "doc_id")
      .count() === 0L)

    // the front door: a byte-identical re-delivery of the forgotten
    // docs (mixed into a fresh batch) is filtered BEFORE any index
    // touch — only the genuinely-new rows append
    val fresh = docs.where($"doc_id" % 5 === 1)
      .select(($"doc_id" + 100000L).as("doc_id"), $"text")
    val redelivery = victims.select($"doc_id", $"text")
      .unionByName(fresh).localCheckpoint()
    val admitted = Forget.forgottenFilter(redelivery, ledger)
    assert(admitted.where($"doc_id".isin(victimIds.toSeq: _*))
      .count() === 0L)
    assert(admitted.count() === fresh.count())
    TextOps.minhashIndexAppend(admitted, idx)
    // serving proof: the victims' own text probes the index and no
    // forgotten doc answers (its content cluster is gone for good)
    val probe = victims.select(($"doc_id" + 200000L).as("doc_id"),
      $"text")
    val served = TextOps.nearDupServe(spark, idx, probe)
    assert(served.where($"doc_a".isin(victimIds.toSeq: _*))
      .count() === 0L)
    // the ledger is append-only across sweeps: a second sweep's keys
    // accumulate with the first's
    Forget.ledgerAppend(spark, ledger,
      Seq(999999L).toDF("doc_id"))
    assert(Forget.ledgerKeys(spark, ledger).count() ===
      victimIds.size + 1L)
  }

  test("the ledger WRITE side refuses an uninitialized path (a sweep " +
    "cannot silently create a ledger nobody reads) and the empty-ledger " +
    "filter is type-consistent with a non-long key") {
    import spark.implicits._
    // appending to a typo'd/uninitialized path must refuse exactly
    // like the read side: tombstoneAppend would otherwise bootstrap a
    // NEW ledger there, the sweep would report "deleted", and the real
    // front door would keep re-admitting the forgotten docs
    val ghost = java.nio.file.Files
      .createTempDirectory("graft_ledger_ghost").resolve("typo").toString
    val e = intercept[IllegalArgumentException] {
      Forget.ledgerAppend(spark, ghost, Seq(1L).toDF("doc_id"))
    }
    assert(e.getMessage.contains("ledgerInit"))
    // ...and a LedgerTarget sweep against it reports failed, not deleted
    val report = Forget.forgetDocs(spark,
      Seq(Forget.LedgerTarget(ghost)), Seq(1L).toDF("doc_id"),
      requireComplete = false)
    val row = report.collect()(0)
    assert(row.getAs[String]("status") == "failed" &&
      row.getAs[String]("detail").contains("ledgerInit"))
    assert(!new java.io.File(s"$ghost/_dels").exists(),
      "a refused append must not create ledger metadata")

    // empty-but-initialized ledger under a STRING key: the empty-path
    // frame must carry the caller's key type (not the hardcoded
    // LongType of s.range(0)), so the filter works identically before
    // and after the first append
    val lg = java.nio.file.Files
      .createTempDirectory("graft_ledger_typed").resolve("lg").toString
    Forget.ledgerInit(spark, lg)
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("name", "v")
    val empty = Forget.forgottenFilter(df, lg, keyCol = "name")
    assert(empty.schema("name").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(empty.count() === 3L)
    Forget.ledgerAppend(spark, lg, Seq("a").toDF("name"),
      keyCol = "name")
    assert(Forget.forgottenFilter(df, lg, keyCol = "name")
      .select($"name").as[String].collect().sorted
      .sameElements(Array("b", "c")))
    assert(Forget.ledgerSize(spark, lg, keyCol = "name") === 1L)
  }

  test("a failing target does not block the others and the sweep " +
    "fails loudly naming it") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
      .where($"doc_id" < 40).localCheckpoint()
    val victims = docs.where($"doc_id" % 5 === 0)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_forget_idx2").toString
    TextOps.minhashIndexWrite(docs, idx)
    val lmState = foldState(Streams.lmSink(_, _, _), docs, "lm2")
    // tampered payload: the additive target must refuse...
    val tampered = victims.select($"doc_id",
      concat($"text", lit(" oops")).as("text"), $"source", $"lang")
    val e = intercept[IllegalArgumentException] {
      Forget.forgetDocs(spark, Seq(
          Forget.IndexTarget(idx),
          Forget.AdditiveStateTarget(lmState, "lm")),
        tampered)
    }
    assert(e.getMessage.contains("INCOMPLETE") &&
      e.getMessage.contains(lmState))
    // ...while the index target's deletion stands (tombstones exist)
    assert(EmbeddingOps.tombstones(spark, idx, "doc_id").count() ===
      victims.count())
    // and requireComplete = false returns the report instead
    val report = Forget.forgetDocs(spark, Seq(
        Forget.AdditiveStateTarget(lmState, "lm")),
      tampered, requireComplete = false)
    val row = report.collect()(0)
    assert(row.getAs[String]("status") == "failed" &&
      row.getAs[String]("detail").contains("contradicts the registry"))
  }

  test("a forget sweep expires pre-sweep pinned views: the live serve " +
    "excludes the victim, the pre-sweep token REFUSES, a post-sweep " +
    "token serves the swept view") {
    import spark.implicits._
    // regression for the governance-composition gap: tombstones alone
    // do not bump the epoch (by design — maintenance deletes keep
    // training-run views intact), so before the sweep-side
    // invalidation a snapshot captured BEFORE a right-to-be-forgotten
    // sweep kept serving the forgotten doc's payload bit-identically
    // until some compaction happened to run
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
      .where($"doc_id" < 40).localCheckpoint()
    val victims = docs.where($"doc_id" % 5 === 0).localCheckpoint()
    val victimIds = victims.select($"doc_id").as[Long].collect().toSet
    val idx = java.nio.file.Files
      .createTempDirectory("graft_forget_snap").toString
    TextOps.minhashIndexWrite(docs, idx)
    // a training run pins its corpus view with a DURABLE token
    val preSnap = EmbeddingOps.indexSnapshot(spark, idx)
    val tok = java.nio.file.Files
      .createTempDirectory("graft_forget_tok").resolve("t.json").toString
    EmbeddingOps.snapshotWrite(spark, tok, preSnap)
    val probe = victims.select(($"doc_id" + 300000L).as("doc_id"),
      $"text")
    // sanity: the pinned serve sees the victims before the sweep
    assert(TextOps.nearDupServe(spark, idx, probe,
        asOf = Some(EmbeddingOps.snapshotRead(spark, tok)))
      .where($"doc_a".isin(victimIds.toSeq: _*)).count() > 0L)

    Forget.forgetDocs(spark, Seq(Forget.IndexTarget(idx)), victims)

    // (a) the live serve excludes the forgotten docs immediately
    assert(TextOps.nearDupServe(spark, idx, probe)
      .where($"doc_a".isin(victimIds.toSeq: _*)).count() === 0L)
    // (b) the pre-sweep pinned view refuses loudly — replaying the
    // forgotten payload through a durable token is exactly what the
    // sweep must make impossible
    val e = intercept[IllegalArgumentException] {
      TextOps.nearDupServe(spark, idx, probe,
        asOf = Some(EmbeddingOps.snapshotRead(spark, tok))).count()
    }
    assert(e.getMessage.contains("snapshot expired"))
    // (c) a POST-sweep snapshot pins the swept view and serves it —
    // invalidation expires history, not the snapshot feature
    val postSnap = EmbeddingOps.indexSnapshot(spark, idx)
    assert(TextOps.nearDupServe(spark, idx, probe,
        asOf = Some(postSnap))
      .where($"doc_a".isin(victimIds.toSeq: _*)).count() === 0L)
    // ...and still answers for SURVIVOR content (probe their text)
    val survivorProbe = docs.where($"doc_id" % 5 =!= 0)
      .select(($"doc_id" + 400000L).as("doc_id"), $"text")
    assert(TextOps.nearDupServe(spark, idx, survivorProbe,
        asOf = Some(postSnap)).count() > 0L,
      "post-sweep pinned serve must still answer for survivors")
    // the FIRST compaction after the sweep PRUNES the swept tree
    // instead of retiring it — the replaced tree still physically
    // holds the tombstone-masked forgotten payload, and a retained
    // copy would keep those bytes at rest past the compaction that
    // was supposed to remove them. The post-sweep token is the
    // documented casualty: forgetting outranks the replay grace, so
    // it refuses (capture again after the compaction for durability).
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1)
    val ePost = intercept[IllegalArgumentException] {
      TextOps.nearDupServe(spark, idx, probe,
        asOf = Some(postSnap)).count()
    }
    assert(ePost.getMessage.contains("snapshot expired"))
    // ...and AT REST: no retired sibling of the index exists at all —
    // after the post-sweep compaction, no copy of the forgotten
    // payload bytes remains anywhere on disk
    val idxRoot = new org.apache.hadoop.fs.Path(idx)
    val idxFs = idxRoot.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!idxFs.listStatus(idxRoot.getParent).map(_.getPath.getName)
        .exists(_.startsWith(s".${idxRoot.getName}.epoch-")),
      "the first post-sweep compaction must delete, never retire, " +
        "the swept tree (masked payload bytes at rest)")
    // the grace is restored after the swept compaction: a fresh token
    // rides the NEXT compaction's retirement normally...
    TextOps.minhashIndexAppend(
      docs.where($"doc_id" % 5 =!= 0 && $"doc_id" % 2 === 0), idx)
    val freshSnap = EmbeddingOps.indexSnapshot(spark, idx)
    assert(TextOps.minhashIndexCompact(spark, idx) >= 1)
    assert(TextOps.nearDupServe(spark, idx, survivorProbe,
        asOf = Some(freshSnap)).count() > 0L,
      "post-sweep-compaction tokens must get the normal grace back")
    // ...and a SECOND sweep prunes that retained copy too: a
    // forgotten payload must never be servable through the grace
    Forget.forgetDocs(spark, Seq(Forget.IndexTarget(idx)),
      docs.where($"doc_id" === 1L))
    val e2 = intercept[IllegalArgumentException] {
      TextOps.nearDupServe(spark, idx, probe,
        asOf = Some(freshSnap)).count()
    }
    assert(e2.getMessage.contains("snapshot expired"))
    // invalidating a non-index path refuses
    assertThrows[IllegalArgumentException](
      EmbeddingOps.snapshotInvalidate(spark,
        java.nio.file.Files.createTempDirectory("graft_noidx")
          .toString))
  }
}
