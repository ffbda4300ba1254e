package graft

import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingOps, IndexMetaCache, TextOps}

/** The serving-metadata cache's safety contract ([[graft.operators
  * .IndexMetaCache]]): only epoch-immutable values (params, quantizer
  * tables) or exact-segment-set-keyed values (summed totals) cache,
  * so a serve must NEVER observe stale metadata through any protocol
  * mutation — append, delete, compaction, rebuild, or even an
  * in-session delete-root-and-rebuild that lands on a previously-seen
  * epoch number. Plus the driver-side term-bucket hash parity: the
  * eager [[TextOps.termBucket]] must equal the plan's
  * `pmod(hash(word), n)` for the bucket IN-list to prune the RIGHT
  * partitions with zero jobs. */
class IndexMetaSpec extends SparkSpec {

  private def freshDir(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_$tag").resolve("ix").toString

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001")
    .documents.toDF().where(col("doc_id") < 200).localCheckpoint()

  test("termBucket (driver-side Murmur3) equals the plan's " +
    "pmod(hash(word), n) for every sampled word and modulus") {
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0).distinct().limit(500)
      .collect().map(_.getString(0)) ++
      Seq("", "a", "élève", "中文", "emoji😀")
    for (n <- Seq(1, 4, 16, 64)) {
      import spark.implicits._
      val planSide = words.toSeq.toDF("word")
        .select(col("word"), pmod(hash(col("word")), lit(n)).as("tb"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      words.foreach { w =>
        assert(TextOps.termBucket(w, n) === planSide(w),
          s"driver/plan bucket drift for '$w' at n=$n")
      }
    }
  }

  test("serving metadata never goes stale: append changes the " +
    "totals key, rebuild bumps the epoch key, and an in-session " +
    "delete-root-and-rebuild (same path, reused epoch number, " +
    "DIFFERENT bucket modulus) invalidates through the mutation door") {
    val idx = freshDir("meta_stale")
    val half = docs.where(col("doc_id") % 2 === 0)
    val rest = docs.where(col("doc_id") % 2 =!= 0)
    val terms = Seq("the", "of", "data")

    // baseline: serve off the half-corpus index (warms the cache)
    TextOps.bm25IndexWrite(half, idx, nBuckets = 16)
    val before = TextOps.bm25TopKIndexed(spark, idx, terms)
      .collect().map(_.toString).sorted

    // APPEND: totals and df change; a stale cached totals row would
    // freeze the collection statistics at the half corpus. The serve
    // must equal a fresh one-shot index over the full corpus.
    TextOps.bm25IndexAppend(rest, idx)
    val appended = TextOps.bm25TopKIndexed(spark, idx, terms)
      .collect().map(_.toString).sorted
    val fullIdx = freshDir("meta_full")
    TextOps.bm25IndexWrite(docs, fullIdx, nBuckets = 16)
    val oneShot = TextOps.bm25TopKIndexed(spark, fullIdx, terms)
      .collect().map(_.toString).sorted
    assert(appended.sameElements(oneShot),
      "post-append serve must reflect the appended segment's mass")
    assert(!appended.sameElements(before),
      "fixture too weak: the append must actually change the ranking")

    // REBUILD at the same path (protocol door — epoch bumps): the
    // serve must flip back to the half corpus, params re-read
    TextOps.bm25IndexWrite(half, idx, nBuckets = 16)
    assert(TextOps.bm25TopKIndexed(spark, idx, terms)
      .collect().map(_.toString).sorted.sameElements(before),
      "post-rebuild serve must reflect the rebuilt corpus")

    // DELETE-ROOT + REBUILD at the same path with a DIFFERENT
    // modulus: epoch numbering restarts, so the (base, epoch) key
    // repeats — the commitGen invalidation hook must keep the serve
    // off the stale nBuckets=16 bucket list (which would prune the
    // WRONG tb partitions of the nBuckets=4 layout and drop postings)
    val root = new org.apache.hadoop.fs.Path(idx)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(root, true)
    TextOps.bm25IndexWrite(docs, idx, nBuckets = 4)
    val rebuilt = TextOps.bm25TopKIndexed(spark, idx, terms)
      .collect().map(_.toString).sorted
    assert(rebuilt.sameElements(oneShot),
      "post-delete-root rebuild must serve the new layout exactly " +
        "(a stale cached modulus would silently drop postings)")
  }

  test("quantizer tables localize per incarnation: the IVF-PQ serve " +
    "equals its pre-cache answer across append, delete, and rebuild") {
    val idx = freshDir("meta_ivfpq")
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings.toDF()
      .where(col("vec_id") < 300).localCheckpoint()
    EmbeddingOps.ivfpqIndexWrite(emb.where(col("vec_id") % 3 =!= 2), idx)
    val q = emb.where(col("vec_id") < 5)
    val before = EmbeddingOps.ivfpqTopKIndexed(spark, idx, q)
      .collect().map(_.toString).sorted
    // append then delete: quantizers unchanged (cache hit is correct);
    // segments and tombstones must still be read FRESH
    EmbeddingOps.ivfpqIndexAppend(emb.where(col("vec_id") % 3 === 2), idx)
    EmbeddingOps.indexDelete(spark, idx,
      emb.where(col("vec_id") % 3 === 2).select(col("vec_id")))
    val after = EmbeddingOps.ivfpqTopKIndexed(spark, idx, q)
      .collect().map(_.toString).sorted
    assert(after.sameElements(before),
      "append+delete of the same slice must round-trip the serve")
    // rebuild over a different slice: new epoch, new quantizers — a
    // stale centroid table would mis-assign probes silently
    EmbeddingOps.ivfpqIndexWrite(emb.where(col("vec_id") % 3 === 0), idx)
    val fresh = freshDir("meta_ivfpq2")
    EmbeddingOps.ivfpqIndexWrite(emb.where(col("vec_id") % 3 === 0), fresh)
    assert(EmbeddingOps.ivfpqTopKIndexed(spark, idx, q)
      .collect().map(_.toString).sorted.sameElements(
        EmbeddingOps.ivfpqTopKIndexed(spark, fresh, q)
          .collect().map(_.toString).sorted),
      "post-rebuild serve must equal a fresh build of the same slice")
  }

  test("cached values persist across calls (an optimization, " +
    "never a leak) and invalidate drops only the named base") {
    IndexMetaCache.clearAll()
    IndexMetaCache.cached("/a", 1L, "k")(java.lang.Integer.valueOf(7))
    IndexMetaCache.cached("/b", 1L, "k")(java.lang.Integer.valueOf(9))
    var recomputed = false
    IndexMetaCache.invalidate("/a")
    assert(IndexMetaCache.cached("/a", 1L, "k") {
      recomputed = true; java.lang.Integer.valueOf(8)
    }.intValue === 8, "invalidate must drop /a's entry")
    assert(recomputed)
    assert(IndexMetaCache.cached("/b", 1L, "k")(
      java.lang.Integer.valueOf(0)).intValue === 9,
      "invalidate must not touch other bases")
  }

  test("a load racing an invalidate is served to its caller but never " +
    "cached: the next call reloads fresh") {
    // the stale-resurrection window: a load begins, a mutation door
    // rebuilds the root and invalidates, the load completes carrying
    // the PRE-mutation value — removing entries alone cannot stop its
    // later put. Deterministic here: the load thunk itself fires the
    // invalidate mid-flight.
    val c = new graft.operators.MetaCache(8)
    val served = c.cached("/r", 1L, "k") {
      c.invalidate("/r") // the rebuild lands while the load is in flight
      java.lang.Integer.valueOf(1) // the now-stale value
    }
    assert(served.intValue === 1,
      "the in-flight caller still gets its (pre-mutation) read")
    var reloaded = false
    val v = c.cached("/r", 1L, "k") {
      reloaded = true; java.lang.Integer.valueOf(2)
    }
    assert(reloaded && v.intValue === 2,
      "the raced load must not have been cached — stale resurrection")
    // and the fresh value caches normally
    assert(c.cached("/r", 1L, "k")(java.lang.Integer.valueOf(9))
      .intValue === 2)
  }

  test("eviction past the bound is LRU: the least-recently-USED entry " +
    "leaves, touched entries stay, and nothing below the bound evicts") {
    // a long-lived serving session over more roots than the bound
    // must keep its hot set — the old wholesale clear() thrashed
    // every entry instead of the stalest one
    val c = new graft.operators.MetaCache(3)
    def put(base: String): Unit =
      { c.cached(base, 1L, "k")(java.lang.Integer.valueOf(1)); () }
    put("/a"); put("/b"); put("/c")
    assert(c.keysNow.map(_._1) == Seq("/a", "/b", "/c"))
    // touch /a: it becomes the most recent; /b is now the LRU
    var reloaded = false
    c.cached("/a", 1L, "k") {
      reloaded = true; java.lang.Integer.valueOf(2)
    }
    assert(!reloaded, "a hit below the bound must not reload")
    put("/d") // over the bound: /b (LRU) evicts, /a (touched) stays
    assert(c.keysNow.map(_._1) == Seq("/c", "/a", "/d"),
      s"expected /b evicted as LRU, got ${c.keysNow}")
    var bReloaded = false
    c.cached("/b", 1L, "k") {
      bReloaded = true; java.lang.Integer.valueOf(3)
    }
    assert(bReloaded, "the evicted entry must reload cold")
    // ...which in turn evicted the new LRU (/c), never a touched one
    assert(c.keysNow.map(_._1) == Seq("/a", "/d", "/b"))
  }
}
