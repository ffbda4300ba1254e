package graft

import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingOps, Multimodal, TextOps}

/** The shard-parallel index merge ([[graft.operators.EmbeddingOps
  * .mergeRoots]] and its family fronts): a merged root must serve
  * byte-identically to a single-root build over the union, survive a
  * kill at every crash window by idempotent resume, refuse unsound
  * merges (modulus mismatch, pending forget sweep, existing
  * destination) BEFORE consuming any source, and carry tombstones
  * through the renumbering. */
class IndexMergeSpec extends SparkSpec {

  private def freshParent(tag: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(s"graft_$tag")

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001")
    .documents.toDF().where(col("doc_id") < 400).localCheckpoint()

  private def shardRoots(parent: java.nio.file.Path, n: Int,
      build: (org.apache.spark.sql.DataFrame, String) => Unit)
      : Seq[String] = (0 until n).map { i =>
    val p = parent.resolve(s"shard$i").toString
    build(docs.where(col("doc_id") % n === i), p)
    p
  }

  private def mhServe(idx: String): Array[String] =
    TextOps.nearDupServe(spark, idx,
        docs.where(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 100000L))
      .collect().map(_.toString).sorted

  test("a merged MinHash root serves identically to a single-root " +
    "build over the union, with the shards' segments renumbered and " +
    "the sources consumed") {
    val parent = freshParent("merge_mh")
    // every shard is MULTI-SEGMENT (write + append) so the
    // renumbering offsets are non-trivial: shard i's segs (0, 1)
    // land at (2i, 2i+1)
    val shards = shardRoots(parent, 3, (d, p) => {
      TextOps.minhashIndexWrite(d.where(col("doc_id") % 5 =!= 1), p)
      TextOps.minhashIndexAppend(d.where(col("doc_id") % 5 === 1), p)
    })
    val dest = parent.resolve("merged").toString
    TextOps.minhashIndexMerge(spark, shards, dest)

    val oneShot = parent.resolve("oneshot").toString
    TextOps.minhashIndexWrite(docs, oneShot)
    val merged = mhServe(dest)
    assert(merged.nonEmpty, "the merge fixture must be non-vacuous")
    assert(merged.sameElements(mhServe(oneShot)),
      "merged serving must equal the union build")

    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    shards.foreach(sp => assert(
      !fs.exists(new org.apache.hadoop.fs.Path(sp)),
      s"merge must consume its source $sp"))
    val (gen, segs) = EmbeddingOps.committedSegs(fs,
      new org.apache.hadoop.fs.Path(dest, "_segs"))
    assert(gen === 0 && segs === Seq(0, 1, 2, 3, 4, 5),
      "three two-segment shards must renumber to segments 0..5")

    // the merged root is a full citizen of the lifecycle: compaction
    // collapses the six shard segments into one, serve unchanged
    assert(TextOps.minhashIndexCompact(spark, dest) === 6)
    assert(mhServe(dest).sameElements(merged),
      "compacting the merged root must not change the serve")
  }

  test("a merged BM25 root accumulates the shards' collection totals " +
    "(serve equals the union build); mismatched bucket moduli refuse " +
    "BEFORE any source is consumed") {
    val parent = freshParent("merge_bm")
    val shards = shardRoots(parent, 2,
      (d, p) => TextOps.bm25IndexWrite(d, p, nBuckets = 16))
    val dest = parent.resolve("merged").toString
    TextOps.bm25IndexMerge(spark, shards, dest)

    val oneShot = parent.resolve("oneshot").toString
    TextOps.bm25IndexWrite(docs, oneShot, nBuckets = 16)
    val terms = Seq("the", "of", "data", "and")
    val merged = TextOps.bm25TopKIndexed(spark, dest, terms)
      .collect().map(_.toString).sorted
    assert(merged.nonEmpty && merged.sameElements(
        TextOps.bm25TopKIndexed(spark, oneShot, terms)
          .collect().map(_.toString).sorted),
      "merged BM25 serving (totals included) must equal the union build")

    // a half-claimed bm25 resume re-validates the moduli with the
    // claimed source read from its husk INSIDE the hidden staging
    // tree — the one resume path where validation's parquet read has
    // a hidden path component
    val shards2 = (0 until 2).map { i =>
      val p = parent.resolve(s"re$i").toString
      TextOps.bm25IndexWrite(docs.where(col("doc_id") % 2 === i), p,
        nBuckets = 16)
      p
    }
    val dest3 = parent.resolve("merged3").toString
    final class Kill extends RuntimeException
    intercept[Kill] {
      TextOps.bm25IndexMerge(spark, shards2, dest3,
        failpoint = tag => if (tag == "claimed") throw new Kill)
    }
    TextOps.bm25IndexMerge(spark, shards2, dest3)
    assert(TextOps.bm25TopKIndexed(spark, dest3, terms)
        .collect().map(_.toString).sorted.sameElements(merged),
      "the resumed bm25 merge must serve like the union build")

    // modulus mismatch: the layouts are not unionable — refuse with
    // the repair, with every live source left untouched
    val odd = parent.resolve("odd").toString
    TextOps.bm25IndexWrite(docs.where(col("doc_id") % 2 === 0), odd,
      nBuckets = 8)
    val other = parent.resolve("other").toString
    TextOps.bm25IndexWrite(docs.where(col("doc_id") % 2 =!= 0), other,
      nBuckets = 16)
    val dest2 = parent.resolve("merged2").toString
    val e = intercept[IllegalArgumentException] {
      TextOps.bm25IndexMerge(spark, Seq(odd, other), dest2)
    }
    assert(e.getMessage.contains("bucket moduli differ"))
    val fs = new org.apache.hadoop.fs.Path(odd)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(odd, other).foreach(sp => assert(
      fs.exists(new org.apache.hadoop.fs.Path(sp, "_segs")),
      s"a refused merge must leave source $sp live"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dest2)),
      "a refused merge must not publish a destination")
  }

  test("a kill at every merge crash window resumes to the identical " +
    "serving root") {
    val expected = {
      val parent = freshParent("merge_exp")
      val oneShot = parent.resolve("oneshot").toString
      TextOps.minhashIndexWrite(docs, oneShot)
      mhServe(oneShot)
    }
    // "claimed" fires once per source: killing at the FIRST leaves a
    // half-claimed merge (one husk, one live source) — the resume
    // shape the claim protocol exists for
    for (window <- Seq("validated", "claimed", "moved",
        "manifest-committed", "husks-dropped", "aside-renamed",
        "published")) {
      val parent = freshParent(s"merge_kill")
      val shards = shardRoots(parent, 2,
        (d, p) => TextOps.minhashIndexWrite(d, p))
      val dest = parent.resolve("merged").toString
      final class Kill extends RuntimeException(window)
      val killed = intercept[Kill] {
        TextOps.minhashIndexMerge(spark, shards, dest,
          failpoint = tag => if (tag == window) throw new Kill)
      }
      assert(killed.getMessage === window)
      if (window == "published") {
        // the swap completed before the kill: the merge IS live
        assert(mhServe(dest).sameElements(expected),
          s"a kill at $window lands after the publish — dest serves")
      } else {
        TextOps.minhashIndexMerge(spark, shards, dest)
        assert(mhServe(dest).sameElements(expected),
          s"resume after a kill at $window must complete the merge")
      }
      val fs = new org.apache.hadoop.fs.Path(dest)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      shards.foreach(sp => assert(
        !fs.exists(new org.apache.hadoop.fs.Path(sp)),
        s"after resume from $window, source $sp must be consumed"))
    }
  }

  test("staging residue from an ABANDONED merge is neither published " +
    "by a fresh different merge nor accepted by a resume with the " +
    "wrong source list") {
    final class Kill extends RuntimeException
    val parent = freshParent("merge_resid")
    def build(tag: String, pred: org.apache.spark.sql.Column): String = {
      val p = parent.resolve(tag).toString
      TextOps.minhashIndexWrite(docs.where(pred), p)
      p
    }
    val dest = parent.resolve("merged").toString
    // merge A assembles fully (manifest committed) and dies before
    // publishing; the operator abandons it
    val a = Seq(build("a0", col("doc_id") % 4 === 0),
      build("a1", col("doc_id") % 4 === 1))
    intercept[Kill] {
      TextOps.minhashIndexMerge(spark, a, dest,
        failpoint = t => if (t == "manifest-committed") throw new Kill)
    }
    // merge B: same destination, different sources, all live — the
    // FRESH run must wipe A's assembled residue, not publish it
    val b = Seq(build("b0", col("doc_id") % 4 === 2),
      build("b1", col("doc_id") % 4 === 3))
    TextOps.minhashIndexMerge(spark, b, dest)
    val oneShot = parent.resolve("oneshot").toString
    TextOps.minhashIndexWrite(
      docs.where(col("doc_id") % 4 >= 2), oneShot)
    assert(mhServe(dest).sameElements(mhServe(oneShot)),
      "the fresh merge must serve ITS union, not the abandoned " +
        "merge's assembly")
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(
      new org.apache.hadoop.fs.Path(dest)).map(_.getPath.getName)
    assert(!entries.exists(_.startsWith("src-")),
      s"merge scaffolding leaked into the published root: " +
        entries.mkString(", "))

    // merge C dies mid-claim; a resume with a DIFFERENT source list
    // must refuse on the identity record, and the true resume
    // completes
    val dest2 = parent.resolve("merged2").toString
    val c = Seq(build("c0", col("doc_id") % 4 === 0),
      build("c1", col("doc_id") % 4 === 1))
    val other = build("c2", col("doc_id") % 4 === 2)
    intercept[Kill] {
      TextOps.minhashIndexMerge(spark, c, dest2,
        failpoint = t => if (t == "claimed") throw new Kill)
    }
    val e = intercept[IllegalArgumentException] {
      TextOps.minhashIndexMerge(spark, Seq(c.head, other), dest2)
    }
    assert(e.getMessage.contains("does not belong to this merge"))
    TextOps.minhashIndexMerge(spark, c, dest2)
    val oneShotC = parent.resolve("oneshotC").toString
    TextOps.minhashIndexWrite(
      docs.where(col("doc_id") % 4 <= 1), oneShotC)
    assert(mhServe(dest2).sameElements(mhServe(oneShotC)),
      "the true resume must complete the interrupted merge")
  }

  test("tombstones carry through the renumbering: a shard's committed " +
    "deletions keep masking exactly their rows in the merged root, " +
    "and the merged compaction applies them physically") {
    val parent = freshParent("merge_dels")
    val shards = shardRoots(parent, 2,
      (d, p) => TextOps.minhashIndexWrite(d, p))
    // tombstone part of shard 0 (ids are even: % 2 === 0 shard)
    val victims = docs.where(col("doc_id") % 2 === 0 &&
      col("doc_id") % 3 === 0).select(col("doc_id"))
    val victimIds = victims.collect().map(_.getLong(0)).toSet
    TextOps.minhashIndexDelete(spark, shards.head, victims)
    val dest = parent.resolve("merged").toString
    TextOps.minhashIndexMerge(spark, shards, dest)

    val masked = mhServe(dest)
    val unmaskedRef = {
      val oneShot = parent.resolve("oneshot").toString
      TextOps.minhashIndexWrite(docs, oneShot)
      mhServe(oneShot)
    }
    assert(unmaskedRef.exists(r =>
        victimIds.exists(v => r.startsWith(s"[$v,"))),
      "fixture too weak: the deletions must intersect the served pairs")
    assert(!masked.exists(r =>
        victimIds.exists(v => r.startsWith(s"[$v,"))),
      "merged serving must keep masking the shard's tombstones")
    assert(TextOps.minhashIndexCompact(spark, dest) === 2)
    assert(mhServe(dest).sameElements(masked),
      "post-compaction serving must be unchanged (deletions physical)")
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(EmbeddingOps.committedSegs(fs,
        new org.apache.hadoop.fs.Path(dest, "_dels"))._2.isEmpty,
      "compaction must clear the carried tombstone manifest")
  }

  test("IVF-PQ shard builds under one trainer root merge into a root " +
    "that serves identically to the trainer's full build; " +
    "independently-trained shards refuse naming the quantizer table") {
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val parent = freshParent("merge_pq")
    val trainer = parent.resolve("trainer").toString
    EmbeddingOps.ivfpqIndexWrite(emb, trainer)
    val shards = (0 until 2).map { i =>
      val p = parent.resolve(s"shard$i").toString
      EmbeddingOps.ivfpqIndexWriteWith(
        emb.where(col("vec_id") % 2 === i), p, trainer)
      p
    }
    val dest = parent.resolve("merged").toString
    EmbeddingOps.ivfpqIndexMerge(spark, shards, dest)
    def serve(idx: String): Array[String] =
      EmbeddingOps.ivfpqTopKIndexed(spark, idx,
          emb.where(col("vec_id") < 5))
        .collect().map(_.toString).sorted
    val merged = serve(dest)
    assert(merged.nonEmpty && merged.sameElements(serve(trainer)),
      "merged shard codes must serve like the trainer's full build " +
        "(per-row deterministic encoding)")

    // independently trained shards: quantizers differ -> refuse, both
    // sources stay live
    val ind = (0 until 2).map { i =>
      val p = parent.resolve(s"ind$i").toString
      EmbeddingOps.ivfpqIndexWrite(
        emb.where(col("vec_id") % 2 === i), p)
      p
    }
    val e = intercept[IllegalArgumentException] {
      EmbeddingOps.ivfpqIndexMerge(spark, ind,
        parent.resolve("merged2").toString)
    }
    assert(e.getMessage.contains("quantizer table"))
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ind.foreach(p => assert(
      fs.exists(new org.apache.hadoop.fs.Path(p, "_segs")),
      s"a refused merge must leave source $p live"))
  }

  test("every remaining persisted ANN family (IVF, PQ, SQ8) round-" +
    "trips the trainer/shard/merge pattern: merged shard roots serve " +
    "identically to the trainer's full build") {
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .localCheckpoint()
    val queries = emb.where(col("vec_id") < 5)
    def pattern(tag: String,
        write: (org.apache.spark.sql.DataFrame, String) => Unit,
        writeWith: (org.apache.spark.sql.DataFrame, String, String)
          => Unit,
        merge: (Seq[String], String) => Unit,
        serve: String => org.apache.spark.sql.DataFrame): Unit = {
      val parent = freshParent(s"merge_$tag")
      val trainer = parent.resolve("trainer").toString
      write(emb, trainer)
      val shards = (0 until 2).map { i =>
        val p = parent.resolve(s"shard$i").toString
        writeWith(emb.where(col("vec_id") % 2 === i), p, trainer)
        p
      }
      val dest = parent.resolve("merged").toString
      merge(shards, dest)
      val merged = serve(dest).collect().map(_.toString).sorted
      assert(merged.nonEmpty && merged.sameElements(
          serve(trainer).collect().map(_.toString).sorted),
        s"$tag: merged shard roots must serve like the trainer's " +
          "full build")
    }
    pattern("ivf",
      (e, p) => EmbeddingOps.ivfIndexWrite(e, p),
      EmbeddingOps.ivfIndexWriteWith,
      EmbeddingOps.ivfIndexMerge(spark, _, _),
      p => EmbeddingOps.ivfTopKIndexed(spark, p, queries))
    pattern("pq",
      (e, p) => EmbeddingOps.pqIndexWrite(e, p),
      EmbeddingOps.pqIndexWriteWith,
      EmbeddingOps.pqIndexMerge(spark, _, _),
      p => EmbeddingOps.pqTopKIndexed(spark, p, queries))
    pattern("sq8",
      (e, p) => EmbeddingOps.sq8IndexWrite(e, p),
      EmbeddingOps.sq8IndexWriteWith,
      EmbeddingOps.sq8IndexMerge(spark, _, _),
      p => EmbeddingOps.sq8TopKIndexed(spark, p, queries))
  }

  test("a merged banded (phash) root serves identically to the union " +
    "build; a source with a pending forget sweep refuses; an existing " +
    "destination refuses") {
    val media = Multimodal.syntheticPngMedia(
      Tables(spark, "/root/testdata/sf0.001").documents.toDF()
        .where(col("doc_id") < 300)).localCheckpoint()
    val parent = freshParent("merge_ph")
    val shards = (0 until 2).map { i =>
      val p = parent.resolve(s"shard$i").toString
      Multimodal.phashIndexWrite(
        media.where(col("doc_id") % 3 === i), p)
      p
    }
    val dest = parent.resolve("merged").toString
    Multimodal.bandedIndexMerge(spark, shards, dest)
    val oneShot = parent.resolve("oneshot").toString
    Multimodal.phashIndexWrite(media.where(col("doc_id") % 3 =!= 2),
      oneShot)
    def serve(idx: String): Array[String] =
      Multimodal.phashNearDupServe(spark, idx,
          media.where(col("doc_id") % 3 === 2))
        .collect().map(_.toString).sorted
    val merged = serve(dest)
    assert(merged.nonEmpty && merged.sameElements(serve(oneShot)),
      "merged banded serving must equal the union build")

    // destination exists -> refuse, sources stay live
    val spare = parent.resolve("spare").toString
    Multimodal.phashIndexWrite(media.where(col("doc_id") % 3 === 2),
      spare)
    val eDest = intercept[IllegalArgumentException] {
      Multimodal.bandedIndexMerge(spark, Seq(spare), dest)
    }
    assert(eDest.getMessage.contains("already exists"))
    val fs = new org.apache.hadoop.fs.Path(spare)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(spare, "_segs")))

    // pending sweep -> refuse naming the owed compaction
    EmbeddingOps.snapshotInvalidate(spark, spare)
    val eSwept = intercept[IllegalArgumentException] {
      Multimodal.bandedIndexMerge(spark, Seq(spare),
        parent.resolve("merged3").toString)
    }
    assert(eSwept.getMessage.contains("pending forget sweep"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(spare, "_segs")),
      "a refused merge must leave the swept source live")
  }
}
