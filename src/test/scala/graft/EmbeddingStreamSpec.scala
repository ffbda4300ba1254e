package graft

import graft.operators.EmbeddingOps
import graft.streaming.Streams

/** Streaming SemDeDup state maintenance ([[Streams.embeddingSink]]):
  * the embedding registry folded per micro-batch must converge to the
  * one-shot batch registry for ANY doc-level slicing (insert-if-absent
  * is idempotent under byte-identical re-delivery), survive
  * kill-and-resume from the checkpoint, refuse mutated vectors
  * loudly, and feed semanticDedup the exact same candidates as a
  * batch run over the full corpus. */
class EmbeddingStreamSpec extends SparkSpec {

  test("streaming embedding registry over sliced corpus equals batch; resume works") {
    import spark.implicits._
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val first = emb.where($"vec_id" < 250)
    val second = emb.where($"vec_id" >= 250)
      .unionAll(emb.where($"vec_id" < 100)) // byte-identical re-delivery
    val streamDir =
      java.nio.file.Files.createTempDirectory("graft_emb_stream")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_emb_ckpt").toString
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_emb_state").resolve("st").toString
    def run(): Unit = {
      val stream = spark.readStream
        .schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
      val q = Streams.embeddingSink(stream, statePath, ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(180000), "stream did not finish")
    }
    first.coalesce(1).write.mode("append").parquet(streamDir.toString)
    run() // phase 1, then the query stops ("killed")
    second.coalesce(1).write.mode("append").parquet(streamDir.toString)
    run() // phase 2: fresh query, same checkpoint + statePath

    val state = Streams.foldState(spark, statePath).localCheckpoint()
    val expected = EmbeddingOps.embeddingRegistry(emb)
    assert(state.count() == emb.count())
    assert(state.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(state).count() == 0)
    // the resumed query saw ONLY the new file: one batch per phase
    val versions = new java.io.File(statePath).list().toSeq
      .filter(_.matches("b\\d+"))
    assert(versions.map(_.drop(1).toLong).max == 1L,
      s"resumed query reprocessed committed files: versions $versions")

    // the downstream contract: semantic dedup over the folded state
    // yields EXACTLY the candidates of a batch run over the corpus
    val viaState = EmbeddingOps.semanticDedup(state)
      .collect().map(_.toString).sorted
    val viaBatch = EmbeddingOps.semanticDedup(emb)
      .collect().map(_.toString).sorted
    assert(viaState.length == viaBatch.length)
    assert(viaState.sameElements(viaBatch))
  }

  test("embedding fold REFUSES a vector re-delivered with different content") {
    val v1 = embDf(Seq(
      (1L, Seq(0.1f, 0.2f, 0.3f), 0),
      (2L, Seq(0.4f, 0.5f, 0.6f), 1)))
    val mutations = Seq(
      // changed values across batches
      "changed" -> embDf(Seq((1L, Seq(0.9f, 0.2f, 0.3f), 0))),
      // same values, relabeled — label rides the content hash too
      "relabeled" -> embDf(Seq((2L, Seq(0.4f, 0.5f, 0.6f), 9))),
      // BOTH versions inside ONE micro-batch: only the audited
      // (ch_lo, ch_hi) pair can see it
      "in-batch" -> embDf(Seq(
        (3L, Seq(0.7f, 0.8f, 0.9f), 0),
        (3L, Seq(0.7f, 0.8f, 0.1f), 0))))
    mutations.foreach { case (label, v2) =>
      val streamDir =
        java.nio.file.Files.createTempDirectory(s"graft_emb_mut_$label")
      v1.coalesce(1).write.mode("append").parquet(streamDir.toString)
      v2.coalesce(1).write.mode("append").parquet(streamDir.toString)
      val statePath = java.nio.file.Files
        .createTempDirectory(s"graft_emb_st_$label").resolve("st").toString
      val stream = spark.readStream
        .schema(v1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
      val q = Streams.embeddingSink(stream, statePath,
          java.nio.file.Files
            .createTempDirectory(s"graft_emb_ck_$label").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val e = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination(180000)
        fail(s"$label: stream finished without refusing the fold")
      }
      def causes(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
      assert(causes(e).exists(
        _.getMessage.contains("re-delivered with DIFFERENT content")),
        s"$label: " + causes(e).map(_.getMessage).mkString(" | "))
    }
  }

  test("streamed registry -> persisted IVF index -> pruned serving, end to end") {
    // the composed incremental-ingest story: vectors arrive through
    // the mutation-guarded streaming registry (dedup + refusal), the
    // index is built FROM the fold state, and serving probes the
    // persisted cell partitions — results must equal an index built
    // directly over the batch corpus
    import spark.implicits._
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val slices = Seq(emb.where($"vec_id" < 250),
      emb.where($"vec_id" >= 250).unionAll(emb.where($"vec_id" < 100)))
    val streamDir =
      java.nio.file.Files.createTempDirectory("graft_e2e_stream")
    slices.foreach(_.coalesce(1).write.mode("append")
      .parquet(streamDir.toString))
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_e2e_state").resolve("st").toString
    val q = Streams.embeddingSink(
        spark.readStream.schema(emb.schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir.toString),
        statePath,
        java.nio.file.Files.createTempDirectory("graft_e2e_ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not finish")

    val registered = Streams.foldState(spark, statePath)
      .select($"vec_id", $"embedding", $"label").localCheckpoint()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_e2e_idx").toString
    EmbeddingOps.ivfIndexWrite(registered, idx)
    val viaStream = EmbeddingOps
      .ivfTopKIndexed(spark, idx, emb.where($"vec_id" < 5))
      .collect().map(_.toString).sorted
    val idxBatch = java.nio.file.Files
      .createTempDirectory("graft_e2e_idx_b").toString
    EmbeddingOps.ivfIndexWrite(emb, idxBatch)
    val viaBatch = EmbeddingOps
      .ivfTopKIndexed(spark, idxBatch, emb.where($"vec_id" < 5))
      .collect().map(_.toString).sorted
    assert(viaStream.sameElements(viaBatch))
  }

  test("streamed registry -> persisted IVF-PQ -> ADC serving equals a " +
    "batch-built composite") {
    // the IVF-PQ twin of the composed IVF pipeline: the mutation-
    // guarded fold state feeds BOTH quantizers (coarse cells AND
    // residual codebooks) and the cell-partitioned code segments;
    // vector-free serving must equal a direct batch build
    import spark.implicits._
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val slices = Seq(emb.where($"vec_id" < 250),
      emb.where($"vec_id" >= 250).unionAll(emb.where($"vec_id" < 100)))
    val streamDir =
      java.nio.file.Files.createTempDirectory("graft_e2e_pq_stream")
    slices.foreach(_.coalesce(1).write.mode("append")
      .parquet(streamDir.toString))
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_e2e_pq_state").resolve("st").toString
    val q = Streams.embeddingSink(
        spark.readStream.schema(emb.schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir.toString),
        statePath,
        java.nio.file.Files
          .createTempDirectory("graft_e2e_pq_ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not finish")

    val registered = Streams.foldState(spark, statePath)
      .select($"vec_id", $"embedding", $"label").localCheckpoint()
    val idx = java.nio.file.Files
      .createTempDirectory("graft_e2e_pq_idx").toString
    EmbeddingOps.ivfpqIndexWrite(registered, idx)
    val viaStream = EmbeddingOps
      .ivfpqTopKIndexed(spark, idx, emb.where($"vec_id" < 5))
      .collect().map(_.toString).sorted
    val idxBatch = java.nio.file.Files
      .createTempDirectory("graft_e2e_pq_idx_b").toString
    EmbeddingOps.ivfpqIndexWrite(emb, idxBatch)
    val viaBatch = EmbeddingOps
      .ivfpqTopKIndexed(spark, idxBatch, emb.where($"vec_id" < 5))
      .collect().map(_.toString).sorted
    assert(viaStream.sameElements(viaBatch))
  }

  test("stateDelete masks embedding registry vectors; semanticDedup " +
    "over the state excludes them; compaction applies and clears") {
    import spark.implicits._
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val streamDir =
      java.nio.file.Files.createTempDirectory("graft_embdel_in")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_embdel_ck").toString
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_embdel_st").resolve("st").toString
    emb.coalesce(1).write.mode("append").parquet(streamDir.toString)
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    val q = Streams.embeddingSink(stream, statePath, ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not finish")
    val victims = Seq(5L, 17L)
    Streams.stateDelete(spark, statePath, victims.toDF("vec_id"))
    val masked = Streams.foldState(spark, statePath).localCheckpoint()
    assert(masked.where($"vec_id".isin(victims: _*)).count() == 0)
    assert(masked.count() == emb.count() - victims.length)
    // serving parity: semantic dedup over the masked state equals a
    // batch run over the corpus WITHOUT the deleted vectors
    val viaState = EmbeddingOps.semanticDedup(masked)
      .collect().map(_.toString).sorted
    val viaBatch = EmbeddingOps.semanticDedup(
        emb.where(!$"vec_id".isin(victims: _*)))
      .collect().map(_.toString).sorted
    assert(viaState.sameElements(viaBatch))
    // compaction applies the tombstones physically and clears them
    assert(Streams.compactState(spark, statePath) > 0)
    assert(!new java.io.File(s"$statePath/_dels").exists())
    val applied = Streams.foldState(spark, statePath)
      .collect().map(_.toString).sorted
    assert(applied.sameElements(
      masked.collect().map(_.toString).sorted))
  }

  test("registry hash quantizes: a sub-milli-unit wobble is NOT a mutation") {
    // the corpus' determinism currency is integer milli-units; a float
    // delivered with noise below round(x*1000) granularity hashes
    // identically, so harmless re-encode jitter cannot poison the fold
    import spark.implicits._
    val a = embDf(Seq((1L, Seq(0.1f, 0.2f), 0)))
    val b = embDf(Seq((1L, Seq(0.1000001f, 0.2000001f), 0)))
    val ha = EmbeddingOps.embeddingRegistry(a)
      .select($"content_hash").collect()(0).getString(0)
    val hb = EmbeddingOps.embeddingRegistry(b)
      .select($"content_hash").collect()(0).getString(0)
    assert(ha == hb)
    // while a full milli-unit move IS a mutation
    val hc = EmbeddingOps.embeddingRegistry(
        embDf(Seq((1L, Seq(0.101f, 0.2f), 0))))
      .select($"content_hash").collect()(0).getString(0)
    assert(ha != hc)
  }
}
