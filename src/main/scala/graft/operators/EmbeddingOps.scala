package graft.operators

import graft.operators.Stage.PinOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search and embedding-based dedup over the `embeddings`
  * table (vec_id, embedding: array<float>, label).
  *
  * Determinism strategy: embeddings are quantized to integer
  * milli-units (round(x*1000) as long), so dot products and squared
  * norms are EXACT integers in any engine and summation order cannot
  * change the result; cosine is then one IEEE expression
  * dot / (sqrt(na)*sqrt(nb)) evaluated identically by Spark and the
  * DuckDB oracle.
  *
  * Scale design: brute-force top-k is the verified baseline (fine when
  * the query set is small — cost is |Q| x corpus, a broadcast of Q, no
  * corpus shuffle). The LSH variant buckets vectors by 8 deterministic
  * random-hyperplane signs so candidate generation is per-bucket; at
  * 100 TB you re-bucket with more planes and a multi-probe, the plan
  * shape stays the same.
  */
object EmbeddingOps {

  /** Quantized view: q = array<long> of round(x*1000), plus the exact
    * squared norm. The float widens to double BEFORE the multiply —
    * float-precision x*1000 can land exactly on a .5 boundary that the
    * exact double product avoids, flipping the rounded milli-unit vs
    * the oracle's double arithmetic. */
  def quantized(emb: DataFrame): DataFrame =
    emb.select(
      col("vec_id"), col("label"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("nn",
        aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))

  /** Exact integer dot product of two quantized vectors via the custom
    * codegen'd expression (graft.plans.DotProductI64) — a tight
    * primitive loop inside whole-stage codegen instead of the
    * zip_with+aggregate HOF pair (which allocates an intermediate array
    * and interprets two lambdas per element). */
  private def qdot(a: Column, b: Column): Column =
    call_function("dot_i64", a, b)

  /** cosine = dot / (sqrt(na)*sqrt(nb)) — one deterministic IEEE
    * expression over exact integers. */
  private def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** Brute-force cosine top-k: for each query vector (vec_id <
    * nQueries) the k nearest corpus vectors. The query side is tiny and
    * broadcast; the corpus is scanned once, never shuffled; top-k per
    * query is a window over |Q|*k rows. */
  def annTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame =
    annTopKQ(quantized(emb), nQueries, k)

  /** [[annTopK]] over an already-[[quantized]] frame — lets pipelines
    * that need several views of the corpus ([[ivfRecall]]) share one
    * quantization scan. */
  def annTopKQ(e: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("nn").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(qdot(col("qv"), col("q")), col("qn"), col("nn")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("label"),
        col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, exact
    * brute force over all ordered pairs — the verified baseline. One
    * side is broadcast (quantized vectors are compact); nothing
    * shuffles. Use [[lshNearestNeighbor]] when |corpus|^2 is the
    * bottleneck. */
  def nearDupCosineBrute(emb: DataFrame,
      threshold: Double = 0.45): DataFrame = {
    val e = quantized(emb)
    val a = e.select(col("vec_id").as("vec_a"), col("q").as("qa"),
      col("nn").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("q").as("qb"),
      col("nn").as("nb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosine(qdot(col("qa"), col("qb")), col("na"), col("nb")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs via LSH bucketing — the
    * scale twin of [[nearDupCosineBrute]]: candidate pairs are
    * generated only WITHIN a hyperplane-sign bucket ([[bucketed]]), so
    * pair cost is the sum of per-bucket quadratics instead of
    * |corpus|^2 and nothing corpus-sized is broadcast or replicated.
    * Same output shape (vec_a, vec_b, cos) and the same exact-integer
    * cosine, so the result is a recall-bounded SUBSET of the brute
    * pairs: a pair surfaces iff it co-buckets (identical vectors
    * always do — equal sign patterns). EmbeddingOpsSpec pins the
    * subset relation; raise nPlanes + multi-probe to trade candidate
    * volume against recall at scale.
    *
    * Sign buckets carry the same template-spam hazard as the text LSH
    * bands (TextOps.cappedBandPairs): a vector duplicated 10⁶ times
    * co-buckets with itself in every plane, and B²/2 pair generation
    * would explode on that ONE bucket. Buckets over `bucketCap`
    * therefore route members to the bucket's min-vec hub as B-1 star
    * pairs (exact cosine still verifies each) — identical vectors all
    * pass at cos 1.0, so downstream grouping sees the same cluster
    * through the hub. At the default 8 planes the cap never triggers
    * on the synthetic corpora (max sign-bucket membership is 24 at
    * sf0.1); the 4-plane dedup row's coarse buckets DO exceed it
    * there, and its oracle mirrors the hub-star routing. */
  def nearDupCosineLsh(emb: DataFrame, threshold: Double = 0.45,
      nPlanes: Int = NPlanes, bucketCap: Int = GroupCap): DataFrame =
    pairsWithinGroup(bucketed(emb, nPlanes), "bucket", threshold,
      bucketCap)
      .drop("bucket")

  /** The embedding family's per-bucket volume bound — the
    * TextOps.BucketCap discipline applied to sign buckets. NOT used
    * by [[semanticDedup]]: a k-means cell is a broad semantic region,
    * not a duplicate cluster, so hub-star routing there would claim
    * near-duplication against one arbitrary representative; SemDeDup
    * bounds its within-cell pair cost by scaling nCentroids with the
    * corpus (the paper's own contract), which keeps cells
    * corpus-fraction-bounded by construction. */
  val GroupCap = 64

  /** Within-group candidate pairs + exact-cosine threshold — the ONE
    * pair generator behind the LSH and semantic near-dup routes (same
    * ordered-id convention, same tie-free exact-integer scoring), so
    * the two candidate-bounding strategies cannot drift in their
    * verification arithmetic. `frame` carries (groupCol, vec_id, q,
    * nn) and feeds BOTH sides of the self-join; the CALLER decides
    * whether to materialize it first (semanticDedup checkpoints its
    * window-derived cells; the LSH route keeps its lazy plan so the
    * broadcast-hint shape stays inspectable and exchange reuse covers
    * the double scan). `groupCap` bounds per-group pair volume by
    * hub-star routing (see [[nearDupCosineLsh]]); the default
    * Int.MaxValue keeps the classic all-pairs plan with no extra
    * window. */
  private def pairsWithinGroup(g: DataFrame, groupCol: String,
      threshold: Double, groupCap: Int = Int.MaxValue): DataFrame = {
    def verified(pairs: DataFrame): DataFrame = pairs
      .select(col(s"a.$groupCol").as(groupCol),
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(qdot(col("a.q"), col("b.q")), col("a.nn"), col("b.nn"))
          .as("cos"))
      .where(col("cos") >= threshold)
    if (groupCap == Int.MaxValue)
      verified(g.as("a").join(g.as("b"),
        col(s"a.$groupCol") === col(s"b.$groupCol") &&
          col("a.vec_id") < col("b.vec_id")))
    else {
      // NOT pinned: this route stays a lazy plan end to end (the
      // docstring contract above — hint shape stays inspectable, a
      // checkpoint here would truncate the planes-broadcast hint out
      // of the analyzed plan); exchange reuse covers the window
      // frame's multiple consumers
      val w = Window.partitionBy(col(groupCol))
      val gx = g
        .withColumn("gn", count(lit(1)).over(w))
        .withColumn("hub", min(col("vec_id")).over(w))
      val small = gx.where(col("gn") <= groupCap)
      val allPairs = small.as("a").join(small.as("b"),
        col(s"a.$groupCol") === col(s"b.$groupCol") &&
          col("a.vec_id") < col("b.vec_id"))
      val hubs = gx.where(col("gn") > groupCap &&
        col("vec_id") === col("hub")).as("a")
      val members = gx.where(col("gn") > groupCap &&
        col("vec_id") =!= col("hub")).as("b")
      val star = hubs.join(members,
        col(s"a.$groupCol") === col(s"b.$groupCol"))
      verified(allPairs).unionByName(verified(star))
    }
  }

  private val NPlanes = 8
  private val Dim = 64

  /** Coarse-quantizer configuration — PUBLIC because the SQL oracle
    * generators (SuiteML's kmeansCellsCte) must train the identical
    * quantizer: seed-centroid count and Lloyd rounds live HERE, in
    * one place, for both the Spark pipeline and its oracles. */
  val KmSeeds = 16
  val KmIters = 2

  /** Deterministic pseudo-random hyperplanes (random-hyperplane LSH,
    * Charikar STOC 2002): plane j's coefficient at
    * component c is (2*nibble - 15) where nibble is the c-th hex digit
    * of md5("p{j}a")||md5("p{j}b") — odd integers in [-15, 15],
    * identical in any engine with md5. nPlanes*Dim rows, broadcast.
    * `nPlanes` sizes the bucket space (2^nPlanes buckets): more planes
    * -> smaller buckets -> cheaper per-bucket pair joins but lower
    * per-bucket recall; [[lshNearestNeighborMultiprobe]] buys the
    * recall back. */
  def planes(emb: DataFrame, nPlanes: Int = NPlanes): DataFrame =
    emb.sparkSession.range(nPlanes.toLong)
      .select(col("id").cast("int").as("plane"),
        concat(md5(concat(lit("p"), col("id"), lit("a"))),
          md5(concat(lit("p"), col("id"), lit("b")))).as("hex"))
      .select(col("plane"), col("hex"),
        explode(sequence(lit(0), lit(Dim - 1))).as("c"))
      .withColumn("coef",
        (conv(expr("substring(hex, c + 1, 1)"), 16, 10).cast("long") * 2
          - 15))
      .select(col("plane"), col("c"), col("coef"))

  /** LSH bucket id per vector: bit j of the bucket is the sign of the
    * exact integer dot(q, plane_j). */
  def bucketed(emb: DataFrame, nPlanes: Int = NPlanes): DataFrame = {
    val e = quantized(emb)
    val comps = e.select(col("vec_id"),
      posexplode(col("q")).as(Seq("c", "qc")))
    val signs = comps
      .join(broadcast(planes(emb, nPlanes)), Seq("c"))
      .groupBy(col("vec_id"), col("plane"))
      .agg(sum(col("qc") * col("coef")).as("pdot"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("pdot") > 0,
        expr("cast(power(2, plane) as bigint)")).otherwise(0L))
        .as("bucket"))
    e.join(signs, Seq("vec_id"))
  }

  /** IVF (inverted-file) top-k, after the coarse-quantizer stage of
    * Jegou et al., "Product quantization for nearest neighbor search",
    * TPAMI 2011 — the other classic ANN scale path:
    * a deterministic coarse quantizer (the first nCentroids vectors,
    * broadcast) assigns every vector to its nearest-centroid cell; a
    * query probes its nProbe nearest cells and brute-forces only those.
    * At scale the assignment is one broadcast pass over the corpus and
    * each query touches |corpus| * nProbe / nCentroids candidates. All
    * scoring is exact-integer cosine, so results are deterministic and
    * oracle-checkable. */
  /** Deterministic seed centroids: the first `nCentroids` vectors of
    * the corpus (cent_id, cq, cn) — the coarse quantizer's starting
    * point for both serving and training. */
  def seedCentroids(e: DataFrame, nCentroids: Int): DataFrame =
    e.where(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("q").as("cq"),
        col("nn").as("cn"))

  /** Centroid assignment shared by the serving ([[ivfTopK]]) and
    * training ([[kmeansStep]], [[kmeansCentroids]]) halves of the
    * coarse quantizer: every vector ranked against the broadcast
    * centroids by exact-integer cosine (ties -> smallest centroid id).
    * One definition — the two halves cannot drift on the assignment
    * rule. Centroids are centroid-cardinality, always broadcast. */
  private def rankedAgainst(e: DataFrame, cents: DataFrame): DataFrame = {
    val scoredCents = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("q"), col("nn"), col("cent_id"),
        cosine(qdot(col("q"), col("cq")), col("nn"), col("cn"))
          .as("ccos"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id").asc)
    scoredCents.withColumn("crk", row_number().over(wAssign))
  }

  private def rankedCentroids(e: DataFrame, nCentroids: Int): DataFrame =
    rankedAgainst(e, seedCentroids(e, nCentroids))

  /** IVF probe against an EXPLICIT centroid frame (cent_id, cq, cn) —
    * the serving half once a trained quantizer exists. [[ivfTopK]] is
    * the seed-centroid special case. `e` is the [[quantized]] corpus. */
  def ivfTopKWith(e: DataFrame, cents: DataFrame, nQueries: Int = 5,
      nProbe: Int = 2, k: Int = 10): DataFrame = {
    val ranked = rankedAgainst(e, cents)
    val cells = ranked.where(col("crk") === 1)
      .select(col("vec_id"), col("q"), col("nn"), col("cent_id").as("cell"))
    val probes = ranked
      .where(col("vec_id") < nQueries && col("crk") <= nProbe)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("nn").as("qn"), col("cent_id").as("cell"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    probes.join(cells, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(qdot(col("qv"), col("q")), col("qn"), col("nn")).as("cos"))
      // no dedup needed: each candidate lives in exactly one cell
      .withColumn("rk", row_number().over(wTop))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
  }

  def ivfTopK(emb: DataFrame, nCentroids: Int = KmSeeds, nQueries: Int = 5,
      nProbe: Int = 2, k: Int = 10): DataFrame = {
    val e = quantized(emb)
    ivfTopKWith(e, seedCentroids(e, nCentroids), nQueries, nProbe, k)
  }

  // ---- persisted-index segment protocol --------------------------------
  // Both persisted indexes (IVF lists, PQ codes) store their data as
  // SEGMENT partition directories (`seg=N`) gated by a generation
  // manifest (`$path/_segs/gen-K`, one committed segment id per line,
  // newest K wins — the Streams fold-state manifest discipline applied
  // to index artifacts). Serving filters `seg IN (committed)` — a
  // STATIC partition filter, so an uncommitted or orphaned segment is
  // invisible at zero IO cost. This is what makes appends
  // crash-atomic: a kill before the segment rename leaves only a
  // hidden staging dir (partition discovery ignores dot-entries); a
  // kill after the rename but before the manifest commit leaves a
  // visible directory no manifest references — serving is unchanged
  // either way, and the next append deletes the leftovers and redoes
  // the batch. Single-writer per index root (the fold-state
  // contract); readers never block.

  private[operators] def fsFor(s: org.apache.spark.sql.SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  /** Newest committed generation and its segment ids; (-1, empty) when
    * no manifest exists (not an index root). */
  private[graft] def committedSegs(fs: org.apache.hadoop.fs.FileSystem,
      metaDir: org.apache.hadoop.fs.Path): (Int, Seq[Int]) = {
    if (!fs.exists(metaDir)) return (-1, Seq.empty)
    val gens = fs.listStatus(metaDir).map(_.getPath.getName)
      .filter(_.startsWith("gen-")).map(_.stripPrefix("gen-").toInt)
    if (gens.isEmpty) return (-1, Seq.empty)
    val g = gens.max
    val in = fs.open(new org.apache.hadoop.fs.Path(metaDir, s"gen-$g"))
    val content =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    (g, content.split("\n").iterator.filter(_.nonEmpty)
      .map(_.toInt).toSeq)
  }

  /** Commit generation `gen` listing `segs`: write a hidden temp file,
    * then one rename — the committing instant. */
  private[graft] def commitGen(fs: org.apache.hadoop.fs.FileSystem,
      metaDir: org.apache.hadoop.fs.Path, gen: Int,
      segs: Seq[Int]): Unit = {
    fs.mkdirs(metaDir)
    val tmp = new org.apache.hadoop.fs.Path(metaDir, s".gen-$gen.tmp")
    val out = fs.create(tmp, true)
    try out.write(segs.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val dest = new org.apache.hadoop.fs.Path(metaDir, s"gen-$gen")
    if (fs.exists(dest)) fs.delete(dest, true)
    require(fs.rename(tmp, dest),
      s"could not commit index manifest $dest")
  }

  /** Append one staged segment to an index root: clear crashed
    * leftovers, write via `writeSeg` into a hidden staging dir, rename
    * it visible, commit the next manifest generation. `failpoint`
    * instruments the two crash windows for the recovery spec. */
  private[operators] def appendSegment(s: org.apache.spark.sql.SparkSession,
      path: String, dataDir: String,
      writeSeg: String => Unit, failpoint: String => Unit): Unit = {
    val (fs, root) = fsFor(s, path)
    val metaDir = new org.apache.hadoop.fs.Path(root, "_segs")
    val (gen, segs) = committedSegs(fs, metaDir)
    require(gen >= 0 && segs.nonEmpty,
      s"no index manifest at $path/_segs — build the index first")
    val segId = segs.max + 1
    val dir = new org.apache.hadoop.fs.Path(root, dataDir)
    val staged =
      new org.apache.hadoop.fs.Path(dir, s".seg-$segId.stage")
    val dest = new org.apache.hadoop.fs.Path(dir, s"seg=$segId")
    // a crashed prior attempt leaves a staging dir or an uncommitted
    // visible segment — both are unreferenced, replaced wholesale
    if (fs.exists(staged)) fs.delete(staged, true)
    if (fs.exists(dest)) fs.delete(dest, true)
    writeSeg(staged.toString)
    failpoint("staged-written")
    require(fs.rename(staged, dest),
      s"could not publish index segment $dest (staged at $staged)")
    failpoint("segment-renamed")
    commitGen(fs, metaDir, gen + 1, segs :+ segId)
  }

  /** Committed-segment filter for a serving scan — a literal IN over
    * the `seg` partition column (static partition pruning, like the
    * probed-cell filter). */
  private[operators] def segFilter(s: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.sql.Column = {
    val (fs, root) = fsFor(s, path)
    val (gen, segs) =
      committedSegs(fs, new org.apache.hadoop.fs.Path(root, "_segs"))
    require(gen >= 0 && segs.nonEmpty,
      s"no index manifest at $path/_segs — not an index root")
    col("seg").isin(segs.map(Int.box): _*)
  }

  /** Delete vectors from ANY persisted index ([[ivfIndexWrite]],
    * [[pqIndexWrite]], [[ivfpqIndexWrite]]) — the retraction half of
    * the index lifecycle (user deletions, retracted documents, the
    * faiss `remove_ids` contract): deletions land as TOMBSTONE
    * segments under `$path/dels/seg=N` gated by their own `_dels`
    * manifest — the exact append protocol, so a delete is
    * CRASH-ATOMIC and O(batch): no list/code segment is rewritten.
    * Serving anti-joins the committed tombstone set; compaction
    * ([[ivfIndexCompact]] family) applies tombstones physically and
    * clears them. Caller contract: a tombstoned vec_id must never be
    * re-appended (tombstones win over every data segment — the
    * re-add would be invisible); one maintainer at a time. */
  def indexDelete(s: org.apache.spark.sql.SparkSession, path: String,
      ids: DataFrame, failpoint: String => Unit = _ => (),
      keyCol: String = "vec_id"): Unit = {
    val (fs, root) = fsFor(s, path)
    val (g, segs) =
      committedSegs(fs, new org.apache.hadoop.fs.Path(root, "_segs"))
    require(g >= 0 && segs.nonEmpty,
      s"no index manifest at $path/_segs — build the index first")
    tombstoneAppend(s, root, ids, keyCol, failpoint)
  }

  /** The tombstone-segment append behind [[indexDelete]] and the fold
    * states' graft.streaming.Streams.stateDelete: deletions land as
    * key segments under `$root/dels/seg=N` gated by their own `_dels`
    * manifest — the exact data-append protocol, so a delete is
    * CRASH-ATOMIC and O(batch) regardless of what the root stores. */
  private[graft] def tombstoneAppend(s: org.apache.spark.sql.SparkSession,
      root: org.apache.hadoop.fs.Path, ids: DataFrame, keyCol: String,
      failpoint: String => Unit = _ => ()): Unit = {
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val metaDir = new org.apache.hadoop.fs.Path(root, "_dels")
    val (dg, dsegs) = committedSegs(fs, metaDir)
    val segId = if (dsegs.isEmpty) 0 else dsegs.max + 1
    val dir = new org.apache.hadoop.fs.Path(root, "dels")
    val staged = new org.apache.hadoop.fs.Path(dir, s".seg-$segId.stage")
    val dest = new org.apache.hadoop.fs.Path(dir, s"seg=$segId")
    if (fs.exists(staged)) fs.delete(staged, true)
    if (fs.exists(dest)) fs.delete(dest, true)
    ids.select(col(keyCol)).distinct()
      .write.mode("overwrite").parquet(staged.toString)
    failpoint("staged-written")
    require(fs.rename(staged, dest),
      s"could not publish tombstone segment $dest")
    failpoint("segment-renamed")
    commitGen(fs, metaDir, math.max(dg, -1) + 1, dsegs :+ segId)
  }

  /** The committed tombstone set of an index — (vec_id), empty when
    * the index has no `_dels` manifest. Unbounded by construction
    * (deletion mass grows with corpus churn), so callers ANTI-JOIN
    * it, never collect it. */
  def tombstones(s: org.apache.spark.sql.SparkSession,
      path: String, keyCol: String = "vec_id"): DataFrame = {
    val (fs, root) = fsFor(s, path)
    val (dg, dsegs) =
      committedSegs(fs, new org.apache.hadoop.fs.Path(root, "_dels"))
    if (dg < 0 || dsegs.isEmpty)
      s.range(0).select(col("id").as(keyCol))
    else
      s.read.parquet(s"$path/dels")
        .where(col("seg").isin(dsegs.map(Int.box): _*))
        .select(col(keyCol))
  }

  /** Persist an IVF index as a warehouse artifact — the offline-build
    * / online-serve split every production ANN system has: the coarse
    * quantizer is fixed once, every vector is assigned once, and the
    * INVERTED LISTS land as cell-partitioned parquet so serving reads
    * only the probed cells. Layout: `$path/centroids` (cent_id, cq,
    * cn — centroid-cardinality), `$path/lists/seg=N/cell=C` segment
    * directories (vec_id, q, nn), and the `$path/_segs` generation
    * manifest gating which segments serving reads. `iters` = 0 keeps
    * the deterministic seed quantizer (the [[ivfTopK]] construction,
    * so indexed serving is oracle-comparable to the live path); > 0
    * runs Lloyd rounds ([[kmeansCentroidsQ]]). The lists are assigned
    * against the READ-BACK centroid table, so index files can never
    * drift from what serving loads. Assignment is one broadcast pass
    * over the corpus; the lists write repartitions by cell so each
    * cell is one file, not tasks x cells (the fold-state discipline).
    *
    * A REBUILD is crash-atomic and stale-proof: the whole tree stages
    * at a hidden sibling and swaps in with the warehouse rename-aside
    * protocol — readers see the old index until the one committing
    * rename, and no partition from a previous (possibly larger) build
    * can survive into the new one regardless of the session's
    * partitionOverwriteMode (there is no partition-level overwrite to
    * misconfigure: the old root leaves wholesale). */
  def ivfIndexWrite(emb: DataFrame, path: String,
      nCentroids: Int = KmSeeds, iters: Int = 0): Unit = {
    val s = emb.sparkSession
    val (fs, root) = fsFor(s, path)
    Warehouse.recoverSwap(fs, root) // heal a crashed previous rebuild
    val tmp = Warehouse.hiddenSibling(root, ".index-tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val e = quantized(emb).pinned
    val cents =
      if (iters == 0) seedCentroids(e, nCentroids)
      else kmeansCentroidsQ(e, nCentroids, iters)
    cents.write.mode("overwrite").parquet(s"$tmp/centroids")
    val saved = s.read.parquet(s"$tmp/centroids")
    // label rides into the stored lists (one keyed join at offline
    // build time) so filtered serving (ivfTopKIndexedWhere) can push
    // metadata predicates into the pruned scan
    rankedAgainst(e, saved).where(col("crk") === 1)
      .select(col("vec_id"), col("q"), col("nn"),
        col("cent_id").cast("int").as("cell"))
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite")
      .parquet(s"$tmp/lists/seg=0")
    commitGen(fs, new org.apache.hadoop.fs.Path(tmp, "_segs"), 0, Seq(0))
    Warehouse.swapInto(fs, tmp, root)
  }

  /** Append a NEW batch of vectors to a persisted IVF index: the
    * batch is assigned against the STORED centroids (the quantizer is
    * fixed at build time — the faiss `add` contract; re-seeding would
    * silently re-home existing lists) and lands as one new segment
    * directory. IO is O(batch), never O(index). The append is
    * CRASH-ATOMIC via the segment protocol above: the segment stages
    * hidden, renames visible, and only the manifest commit makes it
    * servable — a kill anywhere leaves serving exactly as before, and
    * re-running the append completes it. Caller contract: vec_ids
    * must be new (the index has no registry; feed ingestion through
    * the streaming graft.streaming.Streams.embeddingSink registry
    * when dedup/mutation protection matters), and one appender at a
    * time per index root. */
  def ivfIndexAppend(emb: DataFrame, path: String,
      failpoint: String => Unit = _ => ()): Unit = {
    val s = emb.sparkSession
    val cents = s.read.parquet(s"$path/centroids")
    val e = quantized(emb).pinned
    val assigned = rankedAgainst(e, cents)
      .where(col("crk") === 1)
      .select(col("vec_id"), col("q"), col("nn"),
        col("cent_id").cast("int").as("cell"))
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      .repartition(col("cell"))
    appendSegment(s, path, "lists",
      staged => assigned.write.partitionBy("cell")
        .mode("overwrite").parquet(staged),
      failpoint)
  }

  /** Consolidate a persisted index's segment chain — the maintenance
    * twin of Streams.compactState for [[ivfIndexAppend]]/
    * [[pqIndexAppend]] artifacts: after many appends serving fans
    * over every committed `seg=N` directory; compaction reads the
    * committed segments FROM STORAGE (no re-assignment, no
    * re-encoding — the quantizer/codebooks and every row are already
    * final), stages a whole fresh index tree with ONE segment, and
    * swaps it in with the warehouse rename-aside protocol. Readers
    * see the old tree until the committing rename; a kill at any
    * point leaves the old index serving (the staged sibling is hidden
    * and replaced wholesale on retry). Single maintainer at a time.
    * Committed TOMBSTONES ([[indexDelete]]) apply physically during
    * the rewrite and clear with it — a single-segment index with
    * deletions still compacts. Returns the number of segments
    * consolidated (0 = already compact and tombstone-free). */
  def ivfIndexCompact(s: org.apache.spark.sql.SparkSession,
      path: String): Int =
    compactSegments(s, path, "lists", Seq("centroids"),
      df => df.repartition(col("cell"))
        .write.partitionBy("cell").mode("overwrite"))

  /** [[ivfIndexCompact]] for the PQ codes layout (flat segments). */
  def pqIndexCompact(s: org.apache.spark.sql.SparkSession,
      path: String): Int =
    compactSegments(s, path, "codes", Seq("codebooks"),
      df => df.write.mode("overwrite"))

  /** [[ivfIndexCompact]] for the IVF-PQ layout (cell-partitioned code
    * segments; BOTH quantizer tables carry over verbatim). */
  def ivfpqIndexCompact(s: org.apache.spark.sql.SparkSession,
      path: String): Int =
    compactSegments(s, path, "codes", Seq("centroids", "codebooks"),
      df => df.repartition(col("cell"))
        .write.partitionBy("cell").mode("overwrite"))

  private[operators] def compactSegments(
      s: org.apache.spark.sql.SparkSession,
      path: String, dataDir: String, metaNames: Seq[String],
      writer: DataFrame => org.apache.spark.sql.DataFrameWriter[
        org.apache.spark.sql.Row],
      keyCol: String = "vec_id",
      failpoint: String => Unit = _ => (),
      extraSeg: String => Unit = _ => ()): Int = {
    val (fs, root) = fsFor(s, path)
    Warehouse.recoverSwap(fs, root) // heal a crashed previous swap
    val metaDir = new org.apache.hadoop.fs.Path(root, "_segs")
    val (gen, segs) = committedSegs(fs, metaDir)
    require(gen >= 0 && segs.nonEmpty,
      s"no index manifest at $path/_segs — not an index root")
    val (dg, dsegs) =
      committedSegs(fs, new org.apache.hadoop.fs.Path(root, "_dels"))
    val hasDels = dg >= 0 && dsegs.nonEmpty
    // no-op only when there is nothing to consolidate AND no
    // tombstones to apply — a single-segment index with deletions
    // still compacts (that is how tombstones become physical)
    if (segs.size <= 1 && !hasDels) 0
    else {
      val tmp = Warehouse.hiddenSibling(root, ".index-tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      // the quantizer table(s) carry over verbatim (byte-identical
      // serving); the data rows re-land as one segment
      metaNames.foreach { metaName =>
        org.apache.hadoop.fs.FileUtil.copy(fs,
          new org.apache.hadoop.fs.Path(root, metaName), fs,
          new org.apache.hadoop.fs.Path(tmp, metaName), false, false,
          s.sparkContext.hadoopConfiguration)
      }
      // basePath keeps sibling seg roots one logical table (per-root
      // partition discovery would see conflicting structures); the
      // discovered seg column is layout, not data — dropped before
      // the rewrite. Tombstoned rows drop PHYSICALLY here, and the
      // staged tree carries no dels/_dels — compaction clears them.
      val rows = s.read.option("basePath", s"$path/$dataDir")
        .parquet(segs.sorted.map(k => s"$path/$dataDir/seg=$k"): _*)
        .drop("seg")
        .join(tombstones(s, path, keyCol), Seq(keyCol), "left_anti")
      writer(rows).parquet(s"$tmp/$dataDir/seg=0")
      // index-kind-specific sidecars (e.g. the minhash per-bucket stat
      // sidecar) regenerate from the compacted rows INSIDE the staged
      // segment, so the swap publishes data + sidecar together
      extraSeg(s"$tmp/$dataDir/seg=0")
      commitGen(fs, new org.apache.hadoop.fs.Path(tmp, "_segs"), 0,
        Seq(0))
      failpoint("staged-written")
      Warehouse.swapInto(fs, tmp, root, failpoint)
      segs.size
    }
  }

  /** Serve top-k from a PERSISTED index ([[ivfIndexWrite]]): queries
    * (vec_id, embedding) rank against the stored centroids
    * (broadcast, centroid-cardinality) and ONLY the probed cells'
    * list partitions are read — the probe set is bounded by
    * nCentroids BY CONSTRUCTION, so collecting it and pushing a
    * literal `cell IN (...)` is the centroid-broadcast rule, and the
    * pruning is STATIC (visible in the scan's PartitionFilters, not
    * dependent on runtime DPP). IO per serve is
    * |corpus| * nProbe / nCentroids, never the corpus. Only segments
    * the generation manifest commits are read (a second static
    * partition filter, on `seg`) — an in-flight or crashed append is
    * invisible. Candidates with vec_id == query_id are excluded (the
    * corpus-queries convention of [[ivfTopKWith]]). */
  def ivfTopKIndexed(s: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, nProbe: Int = 2,
      k: Int = 10): DataFrame = {
    val cents = s.read.parquet(s"$path/centroids")
    val probes = rankedAgainst(quantized(queries), cents)
      .where(col("crk") <= nProbe)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("nn").as("qn"), col("cent_id").cast("int").as("cell"))
      .pinned // feeds the probe-set literal AND the candidate join
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0))
    val lists = s.read.parquet(s"$path/lists")
      .where(segFilter(s, path) &&
        col("cell").isin(probedCells.map(Int.box): _*))
      // committed tombstones mask deleted vectors (anti-join — the
      // tombstone set is unbounded, never collected)
      .join(tombstones(s, path), Seq("vec_id"), "left_anti")
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    probes.join(lists, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(qdot(col("qv"), col("q")), col("qn"), col("nn")).as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
  }

  /** [[ivfTopKIndexed]] with a metadata predicate pushed INTO the
    * pruned lists scan — filtered ANN, the "search only label L /
    * tenant T" serving mode every vector store exposes: the predicate
    * composes with the static cell and committed-segment prunes and
    * reaches the parquet reader as a pushed filter (the lists store
    * `label` for exactly this), so non-matching vectors are skipped
    * at the scan, never materialized or ranked. Top-k is per query
    * AMONG matching vectors; output carries the label. */
  def ivfTopKIndexedWhere(s: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, pred: Column,
      nProbe: Int = 2, k: Int = 10): DataFrame = {
    val cents = s.read.parquet(s"$path/centroids")
    val probes = rankedAgainst(quantized(queries), cents)
      .where(col("crk") <= nProbe)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("nn").as("qn"), col("cent_id").cast("int").as("cell"))
      .pinned
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0))
    val lists = s.read.parquet(s"$path/lists")
      .where(segFilter(s, path) &&
        col("cell").isin(probedCells.map(Int.box): _*) && pred)
      .join(tombstones(s, path), Seq("vec_id"), "left_anti")
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    probes.join(lists, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(qdot(col("qv"), col("q")), col("qn"), col("nn")).as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("label"),
        col("cos"))
  }

  private val PqM = 4
  private val PqSubDim = Dim / PqM

  /** Every vector's M sub-slices: (vec_id, sub, sq) — the shared
    * entry of the PQ pipeline (codebooks, encode, LUT, training). */
  private def subSlices(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
        explode(sequence(lit(0), lit(PqM - 1))).as("sub"), col("q"))
      .select(col("vec_id"), col("sub"),
        expr(s"slice(q, sub * $PqSubDim + 1, $PqSubDim)").as("sq"))

  /** Per-subspace PQ codebooks (product quantization, Jegou et al.
    * TPAMI 2011 §II): the 64-dim space splits into M=4 subspaces of 16
    * components; subspace s's codebook is the s-slices of the first
    * `kc` corpus vectors (the same deterministic seeding as
    * [[seedCentroids]] — [[pqTrainCodebooks]] refines them). Emits
    * (sub, code, cq, cn) — kc*M rows, always broadcast. */
  def pqCodebooks(e: DataFrame, kc: Int = 16): DataFrame =
    subSlices(e.where(col("vec_id") < kc))
      .select(col("sub"), col("vec_id").cast("int").as("code"),
        col("sq").as("cq"))
      .withColumn("cn", aggregate(col("cq"), lit(0L), (a, x) => a + x * x))

  /** PQ encoding: each vector's code in subspace s is the codeword
    * minimizing exact-integer L2 distance to its s-slice. The
    * vector-side norm is constant within the argmin, so only
    * (cn - 2*dot) is ranked (ties -> smallest code). The argmin is a
    * map-side-combinable min(struct(...)) — the shuffle carries M
    * compact rows per vector, never the kc candidate rows. */
  def pqEncode(e: DataFrame, kc: Int = 16): DataFrame =
    pqEncodeWith(e, pqCodebooks(e, kc))

  private def pqEncodeWith(e: DataFrame, cb: DataFrame): DataFrame =
    subSlices(e)
      .join(broadcast(cb), Seq("sub"))
      .select(col("vec_id"), col("sub"),
        struct((col("cn") - lit(2L) * qdot(col("sq"), col("cq")))
          .as("d2c"), col("code")).as("cand"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(col("cand")).as("best"))
      .select(col("vec_id"), col("sub"), col("best.code").as("code"))

  /** Per-subspace Lloyd training of the PQ codebooks — the PQ twin of
    * [[kmeansCentroids]], with the L2 assignment the encoder uses
    * ([[pqEncodeWith]]) instead of cosine: each round re-encodes the
    * corpus against the current codebooks and recomputes every
    * (sub, code) cell as the per-component mean of its members,
    * RE-QUANTIZED to integer milli-units (round-half-away, identical
    * in Spark and DuckDB) so every round stays in the exact-integer
    * domain and the loop is oracle-checkable. Cells that lose all
    * members drop out (standard Lloyd degeneracy).
    *
    * Scale shape per round: codebooks broadcast, one corpus encode
    * pass, one (vec_id, sub)-keyed join to re-attach slices, component
    * sums map-side-combined on (sub, code, c); the new codebook
    * (<= M*kc rows) is pinned (Stage.pinned) so round t+1 does not
    * re-derive round t. */
  def pqTrainCodebooks(e: DataFrame, kc: Int = 16,
      iters: Int = 2): DataFrame = {
    val subs = subSlices(e)
    var cb = pqCodebooks(e, kc).pinned
    for (_ <- 0 until iters) {
      cb = pqEncodeWith(e, cb)
        .join(subs, Seq("vec_id", "sub"))
        .select(col("sub"), col("code"),
          posexplode(col("sq")).as(Seq("c", "v")))
        .groupBy(col("sub"), col("code"), col("c"))
        .agg(round(sum(col("v")).cast("double") / count(lit(1)))
          .cast("long").as("mq"))
        .groupBy(col("sub"), col("code"))
        .agg(transform(
          array_sort(collect_list(struct(col("c"), col("mq")))),
          x => x.getField("mq")).as("cq"))
        .withColumn("cn",
          aggregate(col("cq"), lit(0L), (a, x) => a + x * x))
        .pinned
    }
    cb
  }

  /** PQ quantization objective: the corpus sum of exact-integer
    * squared L2 distance to each sub-slice's assigned codeword — what
    * [[pqTrainCodebooks]] descends. One row; specs pin that training
    * never worsens the seed (per-step monotonicity is NOT guaranteed
    * under the integer re-quantization, same caveat as
    * [[kmeansObjective]]). */
  def pqObjective(e: DataFrame, cb: DataFrame): DataFrame =
    subSlices(e)
      .withColumn("xn", aggregate(col("sq"), lit(0L), (a, x) => a + x * x))
      .join(broadcast(cb), Seq("sub"))
      .select(col("vec_id"), col("sub"),
        (col("xn") + col("cn") - lit(2L) * qdot(col("sq"), col("cq")))
          .as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(col("d2")).as("best_d2"))
      .agg(sum(col("best_d2")).as("inertia"),
        count(lit(1)).as("n_assignments"))

  /** PQ top-k by asymmetric distance computation (ADC): the query
    * precomputes exact-integer dots against every codeword (a
    * nQueries*M*kc lookup table, broadcast), and each corpus vector is
    * scored as the SUM of M table lookups on its codes — the corpus is
    * touched only through its M-byte-scale codes, never its vectors.
    * Scores are exact integers (adot), so ranking is deterministic
    * (ties -> smallest vec_id) and the oracle replays the whole
    * pipeline. Scale shape: codebooks + LUT broadcast, one encode pass
    * over the corpus, one map-side-combined (query, vec) sum, top-k
    * window over nQueries partitions. */
  def pqTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
      kc: Int = 16): DataFrame =
    pqTopKQ(quantized(emb).pinned, nQueries, k, kc)

  /** [[pqTopK]] over an already-[[quantized]] (and ideally
    * checkpointed) frame — lets [[pqRecall]] share one quantization
    * scan with the brute baseline. */
  def pqTopKQ(e: DataFrame, nQueries: Int = 5, k: Int = 10,
      kc: Int = 16): DataFrame =
    pqTopKWith(e, pqCodebooks(e, kc), nQueries, k)

  /** [[pqTopK]] against an EXPLICIT codebook frame (sub, code, cq, cn)
    * — the serving half once trained codebooks exist
    * ([[pqTrainCodebooks]]); [[pqTopKQ]] is the seed special case. */
  def pqTopKWith(e: DataFrame, cb: DataFrame, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val codes = pqEncodeWith(e, cb)
    val lut = subSlices(e.where(col("vec_id") < nQueries))
      .select(col("vec_id").as("query_id"), col("sub"),
        col("sq").as("qs"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        qdot(col("qs"), col("cq")).as("pdot"))
    val scored = codes.join(broadcast(lut), Seq("sub", "code"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pdot")).as("adot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adot").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("adot"))
  }

  /** Persist a PQ index — the compressed twin of [[ivfIndexWrite]]:
    * codebooks are fixed once (seed, or [[pqTrainCodebooks]] when
    * `iters` > 0), every vector is encoded ONCE against the READ-BACK
    * codebook table, and only the CODES land on disk (`$path/codes`:
    * vec_id, sub, code — M small integers per vector, the entire
    * point of product quantization: the persisted index is ~1/64th
    * the vector data and serving never touches a vector again).
    * Layout: `$path/codebooks` (sub, code, cq, cn — kc*M rows,
    * broadcast-safe by construction), `$path/codes/seg=N` segment
    * directories, and the `$path/_segs` generation manifest. The
    * rebuild stages the whole tree and swaps it in (the
    * [[ivfIndexWrite]] protocol — crash-atomic, immune to
    * partitionOverwriteMode). */
  def pqIndexWrite(emb: DataFrame, path: String, kc: Int = 16,
      iters: Int = 0): Unit = {
    val s = emb.sparkSession
    val (fs, root) = fsFor(s, path)
    Warehouse.recoverSwap(fs, root) // heal a crashed previous rebuild
    val tmp = Warehouse.hiddenSibling(root, ".index-tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val e = quantized(emb).pinned
    val cb = if (iters == 0) pqCodebooks(e, kc)
      else pqTrainCodebooks(e, kc, iters)
    cb.write.mode("overwrite").parquet(s"$tmp/codebooks")
    val saved = s.read.parquet(s"$tmp/codebooks")
    pqEncodeWith(e, saved)
      .write.mode("overwrite").parquet(s"$tmp/codes/seg=0")
    commitGen(fs, new org.apache.hadoop.fs.Path(tmp, "_segs"), 0, Seq(0))
    Warehouse.swapInto(fs, tmp, root)
  }

  /** Append a NEW batch to a persisted PQ index — the compressed
    * twin of [[ivfIndexAppend]], same contract: codebooks are fixed
    * at build time (re-training would silently re-code existing
    * entries), the batch encodes against the READ-BACK codebooks and
    * lands as one new code segment — O(batch) IO, CRASH-ATOMIC via
    * the segment protocol (stage hidden → rename → manifest commit;
    * a kill anywhere leaves serving unchanged and a re-run completes
    * the append). vec_ids must be new; one appender at a time. */
  def pqIndexAppend(emb: DataFrame, path: String,
      failpoint: String => Unit = _ => ()): Unit = {
    val s = emb.sparkSession
    val saved = s.read.parquet(s"$path/codebooks")
    val codes = pqEncodeWith(quantized(emb), saved)
    appendSegment(s, path, "codes",
      staged => codes.write.mode("overwrite").parquet(staged),
      failpoint)
  }

  /** Serve top-k from a PERSISTED PQ index ([[pqIndexWrite]]):
    * queries slice into subspaces and build the ADC lookup table
    * against the stored codebooks (kc*M*queries rows, broadcast by
    * construction); the stored CODES join the LUT on (sub, code) and
    * sum — asymmetric-distance scoring that reads only the code
    * table, never corpus vectors. Candidates with vec_id == query_id
    * are excluded (the [[pqTopKWith]] convention). */
  def pqTopKIndexed(s: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int = 10): DataFrame = {
    val cb = s.read.parquet(s"$path/codebooks")
    val codes = s.read.parquet(s"$path/codes")
      .where(segFilter(s, path)) // committed segments only
      .drop("seg")
      .join(tombstones(s, path), Seq("vec_id"), "left_anti")
    val lut = subSlices(quantized(queries))
      .select(col("vec_id").as("query_id"), col("sub"),
        col("sq").as("qs"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        qdot(col("qs"), col("cq")).as("pdot"))
    val scored = codes.join(broadcast(lut), Seq("sub", "code"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pdot")).as("adot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adot").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("adot"))
  }

  // ---- IVF-PQ composite (IVFADC) ---------------------------------------
  // The two persisted structures composed the way billion-scale ANN
  // systems actually ship (Jegou et al. TPAMI 2011 §III, the faiss
  // IVFPQ structure): the coarse quantizer bounds WHICH candidates are
  // touched (nProbe cells), and product quantization of the RESIDUAL
  // (vector minus its cell centroid) bounds BYTES PER CANDIDATE (M
  // small codes). Under the inner-product metric the score decomposes
  // exactly: dot(q, c + r) = dot(q, cell centroid) + dot(q, residual),
  // and the residual term is served by M ADC table lookups — so a
  // probe reads no corpus vector, only cell-partitioned code rows.

  /** Coarse-assigned residual view of the corpus: every vector keyed
    * by its nearest-centroid cell (the [[rankedAgainst]] rule) with
    * the EXACT integer residual q - cq as its new `q`. Residuals stay
    * in the quantized-integer domain, so the whole PQ machinery
    * ([[pqCodebooks]], [[pqEncodeWith]]) reuses verbatim and the
    * composite remains oracle-replayable. Centroids are
    * centroid-cardinality — always broadcast; the corpus is scanned
    * once and never shuffled here. */
  private def residualized(e: DataFrame, cents: DataFrame): DataFrame =
    rankedAgainst(e, cents).where(col("crk") === 1)
      .select(col("vec_id"), col("q"),
        col("cent_id").cast("int").as("cell"))
      .join(broadcast(cents.select(col("cent_id").cast("int").as("cell"),
        col("cq"))), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("q"), col("cq"), (a, b) => a - b).as("q"))

  /** Query-side probe frame (query_id, cell, cdot): each query ranked
    * against the centroids, top `nProbe` cells kept, and the EXACT
    * integer dot(query, centroid) attached — the coarse half of the
    * decomposed IVFADC score. Output is |queries| * nProbe rows. */
  private def ivfpqProbes(qe: DataFrame, cents: DataFrame,
      nProbe: Int): DataFrame =
    rankedAgainst(qe, cents).where(col("crk") <= nProbe)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("cent_id").cast("int").as("cell"))
      .join(broadcast(cents.select(col("cent_id").cast("int").as("cell"),
        col("cq"))), Seq("cell"))
      .select(col("query_id"), col("cell"),
        qdot(col("qv"), col("cq")).as("cdot"))

  /** ADC scoring tail shared by the live ([[ivfpqTopK]]) and persisted
    * ([[ivfpqTopKIndexed]]) routes: the query LUT (raw query
    * sub-slices x residual codewords — |queries|*M*kc rows, broadcast
    * by construction) joins the candidate code rows cell-first, and
    * each candidate's score is cdot + the sum of its M lookups. All
    * integer, ties -> smallest vec_id — deterministic and replayable.
    * The codes side is the only corpus-sized frame and it is joined
    * against two BROADCAST frames then map-side-combined on
    * (query_id, vec_id) — no corpus shuffle. */
  private def ivfpqAdc(probes: DataFrame, qe: DataFrame, cb: DataFrame,
      codes: DataFrame, k: Int): DataFrame = {
    val lut = subSlices(qe)
      .select(col("vec_id").as("query_id"), col("sub"),
        col("sq").as("qs"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        qdot(col("qs"), col("cq")).as("pdot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adot").desc, col("vec_id").asc)
    codes.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      // cdot is constant within the group (a vector lives in exactly
      // one cell); min() just carries it through the aggregate
      .agg((min(col("cdot")) + sum(col("pdot"))).as("adot"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("adot"))
  }

  /** IVF-PQ top-k (IVFADC), live path: coarse-assign + residual-encode
    * the corpus, then serve the first `nQueries` vectors against it.
    * Scale shape: centroids, codebooks, probes, and LUT are all
    * bounded by construction parameters and broadcast; the corpus is
    * touched by one assignment scan, one encode pass, and the ADC
    * join — never shuffled by key. */
  def ivfpqTopK(emb: DataFrame, nCentroids: Int = KmSeeds,
      kc: Int = 16, nQueries: Int = 5, nProbe: Int = 2,
      k: Int = 10): DataFrame = {
    val e = quantized(emb).pinned
    val cents = seedCentroids(e, nCentroids)
    val res = residualized(e, cents).pinned
    val cb = pqCodebooks(res, kc)
    val codes = pqEncodeWith(res, cb)
      .join(res.select(col("vec_id"), col("cell")), Seq("vec_id"))
    ivfpqAdc(ivfpqProbes(e.where(col("vec_id") < nQueries), cents,
        nProbe), e.where(col("vec_id") < nQueries), cb, codes, k)
  }

  /** Persist an IVF-PQ index: `$path/centroids` (coarse quantizer),
    * `$path/codebooks` (residual PQ codewords), and
    * `$path/codes/seg=N/cell=C` — M small integers per vector,
    * partitioned by coarse cell so serving prunes BOTH dimensions
    * statically (committed segments x probed cells). Both quantizer
    * tables are read back before any encoding, so index files can
    * never drift from what serving loads; the rebuild stages the
    * whole tree and swaps it in (crash-atomic, immune to
    * partitionOverwriteMode). */
  def ivfpqIndexWrite(emb: DataFrame, path: String,
      nCentroids: Int = KmSeeds, kc: Int = 16): Unit = {
    val s = emb.sparkSession
    val (fs, root) = fsFor(s, path)
    Warehouse.recoverSwap(fs, root) // heal a crashed previous rebuild
    val tmp = Warehouse.hiddenSibling(root, ".index-tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val e = quantized(emb).pinned
    seedCentroids(e, nCentroids).write.mode("overwrite")
      .parquet(s"$tmp/centroids")
    val savedCents = s.read.parquet(s"$tmp/centroids")
    val res = residualized(e, savedCents).pinned
    pqCodebooks(res, kc).write.mode("overwrite")
      .parquet(s"$tmp/codebooks")
    val savedCb = s.read.parquet(s"$tmp/codebooks")
    pqEncodeWith(res, savedCb)
      .join(res.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite")
      .parquet(s"$tmp/codes/seg=0")
    commitGen(fs, new org.apache.hadoop.fs.Path(tmp, "_segs"), 0, Seq(0))
    Warehouse.swapInto(fs, tmp, root)
  }

  /** Append a NEW batch to a persisted IVF-PQ index: the batch is
    * coarse-assigned against the STORED centroids and residual-encoded
    * against the STORED codebooks (both quantizers fixed at build
    * time — the faiss `add` contract), landing as one new
    * cell-partitioned code segment. O(batch) IO, CRASH-ATOMIC via the
    * segment protocol. vec_ids must be new; one appender at a time. */
  def ivfpqIndexAppend(emb: DataFrame, path: String,
      failpoint: String => Unit = _ => ()): Unit = {
    val s = emb.sparkSession
    val cents = s.read.parquet(s"$path/centroids")
    val cb = s.read.parquet(s"$path/codebooks")
    val res = residualized(quantized(emb), cents).pinned
    val codes = pqEncodeWith(res, cb)
      .join(res.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .repartition(col("cell"))
    appendSegment(s, path, "codes",
      staged => codes.write.partitionBy("cell")
        .mode("overwrite").parquet(staged),
      failpoint)
  }

  /** Serve top-k from a PERSISTED IVF-PQ index ([[ivfpqIndexWrite]]):
    * queries rank against the stored centroids, the probed-cell set
    * (bounded by nCentroids BY CONSTRUCTION) is collected and pushed
    * as a literal `cell IN (...)` — a STATIC partition filter next to
    * the committed-segment filter, so serve IO is the probed cells'
    * CODE rows only: |corpus| * nProbe / nCentroids rows of M small
    * integers, never a corpus vector. */
  def ivfpqTopKIndexed(s: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, nProbe: Int = 2,
      k: Int = 10): DataFrame = {
    val cents = s.read.parquet(s"$path/centroids")
    val cb = s.read.parquet(s"$path/codebooks")
    val qe = quantized(queries).pinned
    val probes = ivfpqProbes(qe, cents, nProbe).pinned
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0))
    val codes = s.read.parquet(s"$path/codes")
      .where(segFilter(s, path) &&
        col("cell").isin(probedCells.map(Int.box): _*))
      .drop("seg")
      .join(tombstones(s, path), Seq("vec_id"), "left_anti")
    ivfpqAdc(probes, qe, cb, codes, k)
  }

  /** Exact re-scoring tail shared by the persisted
    * ([[ivfpqTopKRerank]]) and live ([[ivfpqRerankRecall]]) rerank
    * routes: candidate (query_id, vec_id) pairs join the exact
    * vectors, score by the same exact-integer cosine as the brute
    * baseline, and keep top-k per query. The candidate frame is
    * bounded BY CONSTRUCTION (rerankR x |queries|) and broadcast, so
    * the corpus-sized vector frame is filtered in a broadcast-hash
    * join — scanned once, never shuffled; the top-k window shuffles
    * only candidate-mass (query_id, vec_id, cos) rows. */
  private def exactRerank(cand: DataFrame, qe: DataFrame,
      vecs: DataFrame, k: Int): DataFrame = {
    val q = qe.select(col("vec_id").as("query_id"), col("q").as("qv"),
      col("nn").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    vecs.join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(qdot(col("qv"), col("q")), col("qn"), col("nn"))
          .as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
  }

  /** Two-stage IVF-PQ serving: ADC top-`rerankR` candidates from the
    * persisted IVF-PQ index, re-scored EXACTLY against the vectors
    * stored in a persisted IVF index's inverted lists, top-k emitted
    * by exact cosine — the standard production refinement (faiss
    * IndexRefine / ADC re-rank): the compressed index bounds which
    * candidates are touched, the exact pass removes the residual
    * quantization's ranking error among them. Both indexes are built
    * from the same corpus (the vec_id -> vector mapping is shared),
    * and tombstones on either index mask its half. Serve-time IO:
    * the ADC stage's statically pruned code rows plus ONE pass over
    * the lists filtered by the broadcast candidate set — the exact
    * vectors never shuffle, and everything broadcast (probes, LUT,
    * candidates, queries) is bounded by construction parameters. */
  def ivfpqTopKRerank(s: org.apache.spark.sql.SparkSession,
      pqPath: String, vecPath: String, queries: DataFrame,
      nProbe: Int = 2, rerankR: Int = 30, k: Int = 10): DataFrame = {
    require(rerankR >= k, s"rerankR ($rerankR) must be >= k ($k)")
    // the vector index's tombstones mask the CANDIDATE ids, not the
    // stored rows: same result (vec_id is the join key either way),
    // but the anti-join shuffles only the bounded (query_id, vec_id)
    // frame — never the exact-vector rows (probe-pinned)
    val cand = ivfpqTopKIndexed(s, pqPath, queries, nProbe, rerankR)
      .select(col("query_id"), col("vec_id"))
      .join(tombstones(s, vecPath), Seq("vec_id"), "left_anti")
    val stored = s.read.parquet(s"$vecPath/lists")
      .where(segFilter(s, vecPath)).drop("seg")
      .select(col("vec_id"), col("q"), col("nn"))
    exactRerank(cand, quantized(queries), stored, k)
  }

  /** recall@k of ADC-only vs ADC+exact-re-rank at the SAME candidate
    * budget R — the measurement that justifies the second stage: both
    * arms read identical top-R ADC candidates, one keeps the ADC
    * order, the other re-scores exactly; each arm's overlap with the
    * exact brute top-k rides one row per query. recall_rerank >=
    * recall_adc whenever ADC's ranking error (not coarse pruning)
    * caused the misses — the lift is the quantization error the
    * refinement pays for itself with. */
  def ivfpqRerankRecall(emb: DataFrame, nCentroids: Int = KmSeeds,
      kc: Int = 16, nQueries: Int = 5, nProbe: Int = 2,
      rerankR: Int = 30, k: Int = 10): DataFrame = {
    val e = quantized(emb).pinned
    val brute = annTopKQ(e, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val adcR = ivfpqTopK(emb, nCentroids, kc, nQueries, nProbe, rerankR)
      .select(col("query_id"), col("rk"), col("vec_id"))
      .pinned // both arms read the same candidate set
    val adcK = adcR.where(col("rk") <= k)
      .select(col("query_id"), col("vec_id"))
    val rer = exactRerank(adcR.select(col("query_id"), col("vec_id")),
        e.where(col("vec_id") < nQueries),
        e.select(col("vec_id"), col("q"), col("nn")), k)
      .select(col("query_id"), col("vec_id"))
    recallVsBrute(brute, adcK, k)
      .withColumnRenamed("n_overlap", "n_adc")
      .withColumnRenamed("recall_at_k", "recall_adc")
      .join(recallVsBrute(brute, rer, k)
        .withColumnRenamed("n_overlap", "n_rerank")
        .withColumnRenamed("recall_at_k", "recall_rerank"),
        Seq("query_id"))
  }

  /** [[truncRecall]]'s width-SELECTION sweep (the dedup_band_sweep
    * discipline applied to the truncation route): recall@k at several
    * prefix widths in one pass, one row per (truncation dim, query) —
    * the curve an operator reads before fixing the low-dim tier of a
    * storage-tiered serving stack (search a prefix tier first,
    * re-rank survivors at full width — [[ivfpqTopKRerank]]'s
    * two-stage shape with dimensionality instead of quantization as
    * the compressor). Scale shape: ONE quantization scan and one
    * full-dim brute baseline pinned for all arms (truncRecall
    * re-derives both per call); each arm is the broadcast-query brute
    * pattern over sliced vectors (slice + norm are per-row
    * projections); recall joins are per-query. */
  def truncRecallSweep(emb: DataFrame,
      dims: Seq[Int] = Seq(8, 16, 32), nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    // same bound as truncRecall: a width beyond the vector length
    // would silently clamp via slice and report recall 1.0 labeled
    // with a bogus trunc_dim
    require(dims.nonEmpty && dims.forall(d => d >= 1 && d <= Dim),
      s"dims must be in [1, $Dim], got $dims")
    val e = quantized(emb).pinned
    val brute = annTopKQ(e, nQueries, k)
      .select(col("query_id"), col("vec_id")).pinned
    dims.map { dd =>
      val t = e.select(col("vec_id"), col("label"),
          expr(s"slice(q, 1, $dd)").as("q"))
        .withColumn("nn",
          aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))
      recallVsBrute(brute,
          annTopKQ(t, nQueries, k).select(col("query_id"),
            col("vec_id")), k)
        .select(lit(dd).as("trunc_dim"), col("query_id"),
          col("n_overlap"), col("recall_at_k"))
    }.reduce(_ unionByName _)
  }

  /** Matryoshka width SELECTION -> truncated-tier BUILD — the
    * composition that makes [[truncRecallSweep]]'s measurement feed a
    * decision instead of a dashboard: run the sweep once, pick the
    * CHEAPEST width whose recall@k clears `recallFloorMilli` (per
    * mille, averaged over the probe queries; falls back to the widest
    * candidate when none clears — serving the best available beats
    * refusing to build), and persist the corpus at that width as a
    * flat quantized tier under the standard index protocol
    * (`$path/vecs/seg=N` + `_segs` manifest + `_dels` tombstones, so
    * [[indexDelete]]/[[tombstones]] work unchanged). Returns the
    * chosen width; `$path/_dim` records it for serving.
    *
    * Scale shape: the selection happens DRIVER-SIDE on the sweep's
    * |dims|-row aggregate card (bounded by the dims construction
    * parameter — never a corpus collect); the build is one
    * slice-projection pass over the corpus; the rebuild is
    * crash-atomic via the warehouse stage-and-swap. */
  def truncIndexBuild(emb: DataFrame, path: String,
      recallFloorMilli: Long = 200L, dims: Seq[Int] = Seq(8, 16, 32),
      nQueries: Int = 5, k: Int = 10): Int = {
    require(recallFloorMilli >= 0,
      s"recallFloorMilli must be >= 0, got $recallFloorMilli")
    val s = emb.sparkSession
    val hits = truncRecallSweep(emb, dims, nQueries, k)
      .groupBy(col("trunc_dim"))
      .agg(sum(col("n_overlap")).as("n_hits"))
      .collect() // |dims| card rows — bounded by the dims parameter
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // avg recall >= floor/1000  <=>  hits * 1000 >= floor * nQ * k,
    // compared in exact integers (no IEEE threshold drift)
    val chosen = dims.sorted
      .find(d => hits.getOrElse(d, 0L) * 1000L >=
        recallFloorMilli * nQueries * k)
      .getOrElse(dims.max)
    val (fs, root) = fsFor(s, path)
    Warehouse.recoverSwap(fs, root) // heal a crashed previous rebuild
    val tmp = Warehouse.hiddenSibling(root, ".index-tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    quantized(emb).select(col("vec_id"), col("label"),
        expr(s"slice(q, 1, $chosen)").as("q"))
      .withColumn("nn",
        aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))
      .write.mode("overwrite").parquet(s"$tmp/vecs/seg=0")
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_dim"), true)
    try out.write(chosen.toString.getBytes("UTF-8")) finally out.close()
    commitGen(fs, new org.apache.hadoop.fs.Path(tmp, "_segs"), 0, Seq(0))
    Warehouse.swapInto(fs, tmp, root)
    chosen
  }

  /** The width a [[truncIndexBuild]] tier was built at (from the
    * `_dim` sidecar the build committed with the tree). */
  def truncIndexDim(s: org.apache.spark.sql.SparkSession,
      path: String): Int = {
    val (fs, root) = fsFor(s, path)
    val p = new org.apache.hadoop.fs.Path(root, "_dim")
    require(fs.exists(p),
      s"no truncated tier at $path — truncIndexBuild it first")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
    finally in.close()
  }

  /** Serve brute cosine top-k from a [[truncIndexBuild]] tier and
    * report recall@k against the FULL-width exact baseline — the
    * online half of the selection->build->serve composition (one row
    * per query, `trunc_dim` stamped from the tier's own sidecar so
    * the report names the width that actually served). The stored
    * tier is read with static committed-segment pruning and tombstone
    * masking; queries are the tier's own first `nQueries` vectors
    * (the [[annTopKQ]] convention, so the served ranking is
    * oracle-comparable to the sweep's per-width arm). */
  def truncServeRecall(s: org.apache.spark.sql.SparkSession,
      path: String, emb: DataFrame, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val stored = s.read.parquet(s"$path/vecs")
      .where(segFilter(s, path)).drop("seg")
      .join(tombstones(s, path), Seq("vec_id"), "left_anti")
    val served = annTopKQ(stored, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val brute = annTopK(emb, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    recallVsBrute(brute, served, k)
      .select(lit(truncIndexDim(s, path)).as("trunc_dim"),
        col("query_id"), col("n_overlap"), col("recall_at_k"))
  }

  /** Inverted-list balance report for a PERSISTED IVF-family index —
    * the operational monitoring artifact every ANN deployment watches
    * (cell imbalance is what drives probe-latency tails: a probe
    * costs its largest probed cell): per-cell committed entry counts
    * with min/max/avg context on every row. Reads the index's own
    * list/code rows (tombstones excluded — the report describes what
    * serving sees); one count aggregate over the cell partition
    * column, output is nCentroids rows. */
  def indexCellStats(s: org.apache.spark.sql.SparkSession,
      path: String, dataDir: String = "lists"): DataFrame = {
    val rows = s.read.parquet(s"$path/$dataDir")
      .where(segFilter(s, path))
      .join(tombstones(s, path), Seq("vec_id"), "left_anti")
      .select(col("cell"), col("vec_id")).distinct()
    val perCell = rows.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_entries"))
    val totals = perCell.agg(
      sum(col("n_entries")).as("n_total"),
      min(col("n_entries")).as("min_entries"),
      max(col("n_entries")).as("max_entries"),
      count(lit(1)).as("n_cells"))
    perCell.join(broadcast(totals), lit(true))
      .select(col("cell"), col("n_entries"), col("n_total"),
        col("min_entries"), col("max_entries"), col("n_cells"),
        (col("n_entries").cast("double") * col("n_cells")
          / col("n_total")).as("balance_ratio"))
  }

  /** recall@k of the IVF-PQ composite against the exact brute top-k —
    * the fifth approximate route's recall row, measuring BOTH losses
    * at once (coarse pruning misses + residual-quantization ranking
    * error). Deterministic end to end. */
  def ivfpqRecall(emb: DataFrame, nCentroids: Int = KmSeeds,
      kc: Int = 16, nQueries: Int = 5, nProbe: Int = 2,
      k: Int = 10): DataFrame = {
    val e = quantized(emb).pinned
    val brute = annTopKQ(e, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val ivfpq = ivfpqTopK(emb, nCentroids, kc, nQueries, nProbe, k)
      .select(col("query_id"), col("vec_id"))
    recallVsBrute(brute, ivfpq, k)
  }

  /** One Lloyd (k-means) update step over the quantized embeddings —
    * the training half of the IVF coarse quantizer ([[ivfTopK]] is the
    * serving half): assign every vector to its nearest current
    * centroid by exact-integer cosine (ties -> smallest centroid id),
    * then recompute each cell's centroid as the per-component mean of
    * its members.
    *
    * Output stays in exploded (cell, component, mean) form: each mean
    * is an exact long sum with ONE final division (deterministic and
    * oracle-checkable), and nothing re-collects arrays through a
    * nondeterministically-ordered collect_list. Scale shape: centroids
    * broadcast, corpus scanned once for assignment, component sums are
    * one map-side-combined shuffle keyed (cell, component). */
  def kmeansStep(emb: DataFrame, nCentroids: Int = KmSeeds): DataFrame =
    rankedCentroids(quantized(emb), nCentroids)
      .where(col("crk") === 1)
      .select(col("cent_id").as("cell"),
        posexplode(col("q")).as(Seq("c", "v")))
      .groupBy(col("cell"), col("c"))
      .agg(count(lit(1)).as("n_members"), sum(col("v")).as("sum_v"))
      .select(col("cell"), col("c"), col("n_members"),
        (col("sum_v").cast("double") / col("n_members")).as("mean_v"))

  /** The closed training loop: `iters` Lloyd rounds, each assigning by
    * exact-integer cosine and recomputing centroids as the per-cell
    * component means RE-QUANTIZED to integer milli-units
    * (round(sum/n) — half away from zero, identical in Spark and
    * DuckDB), so every round's centroids live in the same exact-integer
    * domain as the vectors and the whole loop stays deterministic and
    * oracle-checkable. Cells that lose all members drop out (standard
    * Lloyd degeneracy; cell count can only shrink).
    *
    * Scale shape per round: centroids broadcast, one corpus scan for
    * assignment, component sums one map-side-combined shuffle keyed
    * (cell, c); the new centroid frame (<= nCentroids rows) is
    * pinned (Stage.pinned) so round t+1's plan does not re-derive round t.
    * Returns (cent_id, cq, cn) ready for [[ivfTopKWith]]. */
  def kmeansCentroids(emb: DataFrame, nCentroids: Int = KmSeeds,
      iters: Int = KmIters): DataFrame =
    kmeansCentroidsQ(quantized(emb).pinned, nCentroids, iters)

  /** Per-label embedding mass card — the sanity sweep run before any
    * similarity work (a label whose norm range collapses or explodes
    * signals a broken encoder batch): exact integer counts and
    * squared-norm sums/extremes per label, one map-side-combined
    * aggregate. */
  def embeddingStats(emb: DataFrame): DataFrame =
    quantized(emb).groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("nn")).as("sum_nn"),
        min(col("nn")).as("min_nn"), max(col("nn")).as("max_nn"))

  /** Quantizer-training diagnostics: per centroid, how far Lloyd
    * moved it from its seed — the exact-integer squared L2 drift and
    * the seed-vs-trained cosine. The monitoring row an ANN deployment
    * reads before trusting a retrain (a centroid that barely moved
    * did not need the retrain; one that swung far re-homed its list).
    * Centroid-cardinality output; the corpus is touched only through
    * the training itself. */
  def centroidDrift(emb: DataFrame, nCentroids: Int = KmSeeds,
      iters: Int = KmIters): DataFrame = {
    val e = quantized(emb).pinned
    val seed = seedCentroids(e, nCentroids)
      .select(col("cent_id").cast("long").as("cent_id"),
        col("cq").as("sq"), col("cn").as("sn"))
    val trained = kmeansCentroidsQ(e, nCentroids, iters)
      .select(col("cent_id").cast("long").as("cent_id"),
        col("cq").as("tq"), col("cn").as("tn"))
    seed.join(trained, Seq("cent_id"))
      .select(col("cent_id"),
        aggregate(zip_with(col("sq"), col("tq"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
          .as("drift_sq"),
        cosine(qdot(col("sq"), col("tq")), col("sn"), col("tn"))
          .as("cos"))
  }

  /** [[kmeansCentroids]] over an already-quantized (and ideally
    * checkpointed) frame `e` — the corpus is scanned once per Lloyd
    * round from `e`, never re-derived. */
  def kmeansCentroidsQ(e: DataFrame, nCentroids: Int = KmSeeds,
      iters: Int = KmIters): DataFrame = {
    var cents = seedCentroids(e, nCentroids).pinned
    for (_ <- 0 until iters) {
      cents = rankedAgainst(e, cents)
        .where(col("crk") === 1)
        .select(col("cent_id").as("cell"),
          posexplode(col("q")).as(Seq("c", "v")))
        .groupBy(col("cell"), col("c"))
        .agg(round(sum(col("v")).cast("double") / count(lit(1)))
          .cast("long").as("mq"))
        .groupBy(col("cell").as("cent_id"))
        // array_sort on (c, mq) structs orders by the unique component
        // index, so re-assembly is deterministic (no collect_list order
        // dependence)
        .agg(transform(
          array_sort(collect_list(struct(col("c"), col("mq")))),
          x => x.getField("mq")).as("cq"))
        .withColumn("cn",
          aggregate(col("cq"), lit(0L), (acc, x) => acc + x * x))
        .pinned
    }
    cents
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al.,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication", 2023): cluster with the TRAINED coarse quantizer
    * ([[kmeansCentroidsQ]]), then generate candidate pairs only
    * WITHIN each cluster — the same sum-of-per-cell-quadratics bound
    * as [[nearDupCosineLsh]], but with data-adapted partitions
    * instead of random hyperplanes (SemDeDup's observation: semantic
    * duplicates concentrate inside k-means cells of the embedding
    * space). Output keeps the cell so survivor selection can stay
    * per-cluster; the recall trade is the same as LSH's — a
    * qualifying pair split across cells is missed. Centroids are
    * centroid-cardinality (broadcast); the pair join shuffles on the
    * cell key only. */
  /** Per-vector content registry — the embedding analog of
    * graft.operators.TextOps.minhashRegistry, the state frame the
    * streaming fold (graft.streaming.Streams.embeddingSink) maintains
    * so [[semanticDedup]] can run over an INCREMENTALLY-built corpus:
    * one row per vec_id carrying the payload (embedding + label) and
    * a content hash over the QUANTIZED milli-units (the corpus'
    * determinism currency — float rendering would be engine-unstable).
    * Re-delivering a vector byte-identically is a no-op; any mutation
    * is detectable by hash. One scan, one keyed aggregate. */
  def embeddingRegistry(emb: DataFrame): DataFrame =
    embeddingRegistryAudited(emb)
      .withColumnRenamed("ch_lo", "content_hash").drop("ch_hi")

  /** [[embeddingRegistry]] with the content hash as a (min, max) pair
    * per vec_id, so a vector delivered twice within ONE micro-batch
    * with different values surfaces as ch_lo != ch_hi instead of
    * collapsing silently — same audited shape as
    * TextOps.minhashRegistryAudited, consumed by the streaming fold's
    * refuse-on-mutation check. */
  private[graft] def embeddingRegistryAudited(emb: DataFrame): DataFrame = {
    val ch = md5(concat_ws("|",
      concat_ws(",", transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long").cast("string"))),
      coalesce(col("label").cast("string"), lit(""))))
    emb.select(col("vec_id"), ch.as("ch"),
        struct(col("embedding"), col("label")).as("payload"))
      .groupBy(col("vec_id"))
      .agg(min(col("ch")).as("ch_lo"), max(col("ch")).as("ch_hi"),
        // rows in a group are identical whenever the refuse check can
        // pass (ch_lo == ch_hi), so the min_by pick is deterministic
        min_by(col("payload"), col("ch")).as("payload"))
      .select(col("vec_id"), col("ch_lo"), col("ch_hi"),
        col("payload.embedding").as("embedding"),
        col("payload.label").as("label"))
  }

  def semanticDedup(emb: DataFrame, nCentroids: Int = KmSeeds,
      iters: Int = KmIters, threshold: Double = 0.45): DataFrame = {
    val e = quantized(emb).pinned
    val cents = kmeansCentroidsQ(e, nCentroids, iters)
    val cells = rankedAgainst(e, cents).where(col("crk") === 1)
      .select(col("vec_id"), col("q"), col("nn"),
        col("cent_id").as("cell"))
      .pinned // feeds both sides of the pair self-join
    pairsWithinGroup(cells, "cell", threshold)
  }

  /** Clustering objective for the trained quantizer: per-corpus sum of
    * (1 - cos(vector, assigned centroid)) plus the member count — the
    * spherical-k-means inertia the trainer is descending. One row;
    * used by specs to pin that training never worsens the seed
    * objective (per-step monotone descent is NOT guaranteed under the
    * integer-requantized update, so only seed-vs-trained is pinned). */
  def kmeansObjective(emb: DataFrame, cents: DataFrame): DataFrame =
    rankedAgainst(quantized(emb), cents)
      .where(col("crk") === 1)
      .agg(sum(lit(1.0) - col("ccos")).as("inertia"),
        count(lit(1)).as("n_vectors"))

  /** recall@k of the TRAINED IVF probe against the exact brute-force
    * top-k ([[annTopK]]) — the measurement that closes the ANN loop:
    * per query, how many of the true k nearest the nprobe-cell search
    * found. Both sides are deterministic, so the recall is an exact
    * integer ratio the oracle recomputes end-to-end (including the
    * Lloyd rounds). */
  def ivfRecall(emb: DataFrame, nCentroids: Int = KmSeeds, iters: Int = KmIters,
      nQueries: Int = 5, nProbe: Int = 4, k: Int = 10): DataFrame = {
    // ONE quantization scan shared by the brute baseline, the trainer
    // (every Lloyd round), and the probe — checkpointed so none of the
    // three re-derives it from the raw embeddings
    val e = quantized(emb).pinned
    val brute = annTopKQ(e, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val ivf = ivfTopKWith(e, kmeansCentroidsQ(e, nCentroids, iters),
        nQueries, nProbe, k)
      .select(col("query_id"), col("vec_id"))
    recallVsBrute(brute, ivf, k)
  }

  /** recall@k overlap tail shared by [[ivfRecall]] and [[pqRecall]]:
    * per query, how many of the exact brute top-k the approximate
    * route found — both inputs are (query_id, vec_id) frames, the
    * ratio is one exact-integer division. */
  private def recallVsBrute(brute: DataFrame, approx: DataFrame,
      k: Int): DataFrame = {
    val hits = brute.join(approx, Seq("query_id", "vec_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    brute.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / k)
          .as("recall_at_k"))
  }

  /** recall@k of the PQ ADC ranking ([[pqTopK]]) against the exact
    * brute top-k — the PQ twin of [[ivfRecall]], closing the loop for
    * the compressed route: every approximate path ships with its
    * recall measurement. Deterministic on both sides, so the oracle
    * replays it end-to-end. */
  def pqRecall(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
      kc: Int = 16): DataFrame = {
    // one quantization scan shared by the brute baseline and the PQ
    // pipeline (codebooks, encode, LUT)
    val e = quantized(emb).pinned
    val brute = annTopKQ(e, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val pq = pqTopKQ(e, nQueries, k, kc)
      .select(col("query_id"), col("vec_id"))
    recallVsBrute(brute, pq, k)
  }

  /** [[pqRecall]] with TRAINED codebooks ([[pqTrainCodebooks]], the
    * closed per-subspace Lloyd loop) — measures what the training
    * bought the compressed route, next to the seed-codebook
    * sim_pq_recall row. Deterministic end to end (every Lloyd round
    * re-quantizes to exact integers), so the oracle replays rounds,
    * encode, ADC, and overlap. */
  def pqRecallTrained(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
      kc: Int = 16, iters: Int = 2): DataFrame = {
    val e = quantized(emb).pinned
    val brute = annTopKQ(e, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val pq = pqTopKWith(e, pqTrainCodebooks(e, kc, iters), nQueries, k)
      .select(col("query_id"), col("vec_id"))
    recallVsBrute(brute, pq, k)
  }

  /** recall@k of SAME-BUCKET (single-probe) LSH search against the
    * brute top-k — the recall row the LSH route was missing next to
    * IVF/PQ/truncation/SQ8: candidates come from the query's own
    * bucket only, ranked by exact cosine; what single-probe misses is
    * the bucketing's cost, which the Hamming-1 multiprobe
    * (sim_lsh_multiprobe) buys back. A query with an empty bucket
    * neighborhood still reports its 0 row. */
  def lshRecall(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
      nPlanes: Int = NPlanes): DataFrame = {
    val e = quantized(emb).pinned
    val brute = annTopKQ(e, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val b = bucketed(emb, nPlanes).pinned
    val q = b.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("nn").as("qn"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val approx = b.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(qdot(col("qv"), col("q")), col("qn"), col("nn"))
          .as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("vec_id"))
    recallVsBrute(brute, approx, k)
  }

  /** recall@k of TRUNCATED-dimension search (the first `dims` of the
    * 64) against the full-dimension brute top-k — the
    * dimensionality-reduction scale path (Kusupati et al., "Matryoshka
    * Representation Learning", NeurIPS 2022: embedding prefixes serve
    * as usable coarse representations). Truncation cuts ANN compute
    * and candidate-state memory Dim/dims-fold with an UNCHANGED plan
    * shape (same broadcast-queries scan, shorter arrays), so next to
    * LSH buckets, IVF cells, and PQ codes it is the fourth
    * approximate route — and like them it ships with its recall
    * measurement. Exact-integer on both sides; the oracle replays
    * slice, norms, and overlap end-to-end. */
  def truncRecall(emb: DataFrame, dims: Int = 16, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    require(dims >= 1 && dims <= Dim,
      s"dims must be in [1, $Dim], got $dims")
    // one quantization scan shared by the full-dim baseline and the
    // truncated probe
    val e = quantized(emb).pinned
    val brute = annTopKQ(e, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val t = e.select(col("vec_id"), col("label"),
        slice(col("q"), 1, dims).as("q"))
      .withColumn("nn",
        aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))
    val trunc = annTopKQ(t, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    recallVsBrute(brute, trunc, k)
  }

  /** Per-dimension 8-bit scalar quantization (SQ8) — the fifth
    * approximate route next to LSH buckets, IVF cells, PQ codes, and
    * truncation: each milli-unit dimension maps to a byte code
    * c = (q - mn) * 255 div (mx - mn) against per-dimension corpus
    * [mn, mx] ranges (the fixed-point compression faiss ships as
    * ScalarQuantizer QT_8bit), an 8x memory cut that keeps ALL
    * dimensions where truncation keeps all bits of a few.
    * Deterministic end to end: ranges are exact integer aggregates,
    * codes exact integer arithmetic (the numerator is >= 0 by
    * construction — mn is the per-dim minimum — so truncating div IS
    * floor div, and Spark's `div` agrees with DuckDB's `//`), and
    * ranking uses the exact-integer reconstruction
    * r = mn * 255 + c * (mx - mn) (milli-units scaled by the constant
    * 255, which cancels in cosine).
    *
    * Scale shape: the range pass is one posexplode + groupBy(pos)
    * aggregate whose partial min/max combine map-side, so the shuffle
    * carries Dim rows per partition, never the corpus; the Dim-row
    * collect is bounded by the embedding dimensionality (a
    * construction parameter, like nCentroids/nPlanes); coding is then
    * a pure per-row projection against two literal arrays — no join,
    * no second shuffle, fused into whatever consumes it. */
  /** Per-dim [mn, mx] ranges of an already-[[quantized]] frame as a
    * Dim-row table (pos, mn, mx) — the SQ8 "quantizer table" a
    * persisted index stores, playing the role the centroids table
    * plays for IVF. */
  private def sq8Ranges(e: DataFrame): DataFrame =
    e.select(posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))

  /** Collected ranges (pos-ordered Dim rows — construction-bounded)
    * as the two literal arrays the coding/reconstruction projections
    * consume. */
  private def sq8Lits(ranges: Array[org.apache.spark.sql.Row])
      : (Column, Column) = {
    val mnA = array(ranges.toIndexedSeq.map(r => lit(r.getLong(1))): _*)
    val rgA = array(ranges.toIndexedSeq
      .map(r => lit(r.getLong(2) - r.getLong(1))): _*)
    (mnA, rgA)
  }

  /** Byte codes of a quantized vector column against literal ranges.
    * `clamp` guards serve-time queries that fall OUTSIDE the stored
    * corpus range (the quantizer is fixed at build time); corpus
    * members are in range by construction, so clamping is the
    * identity for them and the live/persisted parity holds. */
  private def sq8Code(q: Column, mnA: Column, rgA: Column,
      clamp: Boolean): Column = {
    val raw = zip_with(zip_with(q, mnA, (x, m) => x - m), rgA,
      (x, r) => when(r === 0L, lit(0L))
        .otherwise(call_function("div", x * lit(255L), r)))
    if (clamp) transform(raw, c => greatest(lit(0L), least(lit(255L), c)))
    else raw
  }

  /** Exact-integer reconstruction (in 255ths of a milli-unit) from a
    * code column. */
  private def sq8Recon(c: Column, mnA: Column, rgA: Column): Column =
    zip_with(zip_with(c, rgA, (cc, g) => cc * g), mnA,
      (p, m) => m * lit(255L) + p)

  def sq8Reconstructed(e: DataFrame): DataFrame = {
    val (mnA, rgA) =
      sq8Lits(sq8Ranges(e).orderBy(col("pos")).collect())
    e.withColumn("c", sq8Code(col("q"), mnA, rgA, clamp = false))
      .withColumn("r", sq8Recon(col("c"), mnA, rgA))
      .withColumn("rn",
        aggregate(col("r"), lit(0L), (acc, x) => acc + x * x))
  }

  /** SQ8 top-k over an already-[[quantized]] frame: symmetric
    * quantized comparison (queries rank by their own codes' exact
    * reconstructions — SDC, in the Jegou et al. taxonomy), same
    * broadcast-queries/corpus-scan plan as [[annTopKQ]]. */
  def sq8TopKQ(e: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val r = sq8Reconstructed(e)
    val q = r.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("r").as("qr"),
        col("rn").as("qn"))
    val scored = r.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(qdot(col("qr"), col("r")), col("qn"), col("rn")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("label"),
        col("cos"))
  }

  def sq8TopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame =
    sq8TopKQ(quantized(emb), nQueries, k)

  /** recall@k of the SQ8 ranking against the exact brute top-k — the
    * SQ8 recall row, matching the LSH/IVF/PQ/truncation discipline:
    * no approximate route ships without its measurement. */
  def sq8Recall(emb: DataFrame, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val e = quantized(emb).pinned
    val brute = annTopKQ(e, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val sq = sq8TopKQ(e, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    recallVsBrute(brute, sq, k)
  }

  /** Persist an SQ8 index: the Dim-row `ranges` quantizer table plus
    * codes-only `codes/seg=N` segments (vec_id, label, c as
    * array<smallint> — int16 parquet, a 4x cut vs the float vectors;
    * a production layout would pack to raw bytes, the plan shape is
    * unchanged). Completes the persisted family: every approximate
    * route that ships (LSH excepted — stateless planes) has an
    * offline-build/online-serve twin: IVF lists, PQ codes, IVF-PQ
    * residual codes, and now SQ8 codes. Same crash-atomic segment
    * protocol, same rebuild-by-swap. */
  def sq8IndexWrite(emb: DataFrame, path: String): Unit = {
    val s = emb.sparkSession
    val (fs, root) = fsFor(s, path)
    Warehouse.recoverSwap(fs, root)
    val tmp = Warehouse.hiddenSibling(root, ".index-tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val e = quantized(emb).pinned
    sq8Ranges(e).write.mode("overwrite").parquet(s"$tmp/ranges")
    val (mnA, rgA) = sq8Lits(
      s.read.parquet(s"$tmp/ranges").orderBy(col("pos")).collect())
    e.select(col("vec_id"), col("label"),
        sq8Code(col("q"), mnA, rgA, clamp = false)
          .cast("array<smallint>").as("c"))
      .write.mode("overwrite").parquet(s"$tmp/codes/seg=0")
    commitGen(fs, new org.apache.hadoop.fs.Path(tmp, "_segs"), 0, Seq(0))
    Warehouse.swapInto(fs, tmp, root)
  }

  /** Append new vectors to a persisted SQ8 index: coded against the
    * STORED ranges (the quantizer is fixed at build time — the faiss
    * `add` contract; out-of-range values CLAMP to the byte domain),
    * one crash-atomic segment, O(batch) IO. */
  def sq8IndexAppend(emb: DataFrame, path: String,
      failpoint: String => Unit = _ => ()): Unit = {
    val s = emb.sparkSession
    val (mnA, rgA) = sq8Lits(
      s.read.parquet(s"$path/ranges").orderBy(col("pos")).collect())
    appendSegment(s, path, "codes",
      staged => quantized(emb).select(col("vec_id"), col("label"),
          sq8Code(col("q"), mnA, rgA, clamp = true)
            .cast("array<smallint>").as("c"))
        .write.mode("overwrite").parquet(staged),
      failpoint)
  }

  /** Serve top-k from a persisted SQ8 index: queries quantize and
    * code LIVE against the stored ranges (Dim-row collect, bounded by
    * construction), the committed code segments are scanned once
    * (tombstones masked), and both sides rank by their exact-integer
    * reconstructions — byte codes are the only per-vector state read;
    * no corpus vector exists in the index at all. Output matches
    * [[sq8TopKQ]] exactly when the index was built from the same
    * corpus the queries come from. */
  def sq8TopKIndexed(s: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int = 10): DataFrame = {
    val (mnA, rgA) = sq8Lits(
      s.read.parquet(s"$path/ranges").orderBy(col("pos")).collect())
    val q = quantized(queries)
      .select(col("vec_id").as("query_id"),
        sq8Recon(sq8Code(col("q"), mnA, rgA, clamp = true), mnA, rgA)
          .as("qr"))
      .withColumn("qn",
        aggregate(col("qr"), lit(0L), (acc, x) => acc + x * x))
    val codes = s.read.parquet(s"$path/codes")
      .where(segFilter(s, path)).drop("seg")
      .join(tombstones(s, path), Seq("vec_id"), "left_anti")
      .withColumn("r", sq8Recon(
        transform(col("c"), x => x.cast("long")), mnA, rgA))
      .withColumn("rn",
        aggregate(col("r"), lit(0L), (acc, x) => acc + x * x))
    val scored = codes.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(qdot(col("qr"), col("r")), col("qn"), col("rn")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("label"),
        col("cos"))
  }

  /** LSH-bucketed nearest neighbor: within each bucket, every vector's
    * top-1 neighbor by exact cosine (the scale path for
    * dedup-by-nearest-neighbor; singleton buckets surface with a null
    * neighbor). The CANDIDATE side is volume-capped by default: each
    * bucket contributes at most `candidateCap` prefix members (by
    * vec_id) to the scored pairs, so a mega-bucket costs B·cap, not
    * B² — every vector still answers (the query side is uncapped),
    * but a neighbor outside the bucket's candidate prefix is not
    * considered. Identical results to the uncapped join whenever
    * every bucket fits the cap (true at all oracle scales). */
  def lshNearestNeighbor(emb: DataFrame, nPlanes: Int = NPlanes,
      candidateCap: Int = GroupCap): DataFrame = {
    val b = bucketed(emb, nPlanes)
    val pairs = b.as("a").join(capCandidates(b, candidateCap).as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("a.bucket").as("bucket"),
        col("b.vec_id").as("nn_id"),
        cosine(qdot(col("a.q"), col("b.q")), col("a.nn"), col("b.nn"))
          .as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nn_id").asc)
    val best = pairs.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1).drop("rk")
    b.select(col("vec_id"), col("bucket"))
      .join(best.select(col("vec_id"), col("nn_id"), col("cos")),
        Seq("vec_id"), "left")
  }

  /** Per-bucket CANDIDATE bound for the NN-serving routes — the
    * scoring-side twin of the pair-generation cap: every vector still
    * queries, but scores against at most `cap` candidates per probed
    * bucket (the bucket's `cap` smallest vec_ids — a deterministic
    * prefix, so results replay and oracles mirror with one
    * row_number). Without it a mega-bucket (one vector duplicated 10⁶
    * times co-buckets with itself in every plane) costs B² scored
    * pairs; with it the cost is B·cap, and the spam case keeps its
    * exact answer (every prefix member of an identical-vector bucket
    * scores cos 1.0). Borderline vectors in an oversized MIXED bucket
    * may miss a non-prefix neighbor — the documented recall trade,
    * bought back the same way as bucket coarseness (raise nPlanes /
    * multiprobe). The row_number pre-trims via WindowGroupLimit, so
    * the bound is enforced before any scoring join. */
  private def capCandidates(b: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy(col("bucket")).orderBy(col("vec_id").asc)
    b.withColumn("crk", row_number().over(w))
      .where(col("crk") <= cap).drop("crk")
  }

  /** Multi-probe LSH nearest neighbor (after Lv et al., "Multi-probe
    * LSH: efficient indexing for high-dimensional similarity search",
    * VLDB 2007, restricted to the deterministic Hamming-1 probe set):
    * each vector searches its own bucket PLUS the nPlanes buckets at
    * Hamming distance 1 (one sign bit flipped) — the buckets a
    * borderline vector most likely fell into. Candidate volume grows
    * (nPlanes+1)x while recall approaches a coarser single-probe
    * table's; at scale this is the standard way to RAISE nPlanes
    * (shrinking buckets, and per-bucket quadratic pair cost) without
    * losing neighbors — the fix for the fixed-8-planes limitation.
    * A candidate lives in exactly one bucket, so probe targets are
    * distinct and no pair is scored twice. Singleton-probe-space
    * vectors surface with a null neighbor like [[lshNearestNeighbor]]
    * — whose per-bucket `candidateCap` prefix bound (and its
    * exact-under-the-cap contract) applies here too. */
  def lshNearestNeighborMultiprobe(emb: DataFrame,
      nPlanes: Int = NPlanes, candidateCap: Int = GroupCap): DataFrame = {
    val b = bucketed(emb, nPlanes).pinned
    val probeCols = col("bucket") +:
      (0 until nPlanes).map(j => col("bucket").bitwiseXOR(lit(1L << j)))
    val probes = b.select(col("vec_id"), col("q"), col("nn"),
      col("bucket"), explode(array(probeCols: _*)).as("pb"))
    val cand = capCandidates(b, candidateCap)
      .select(col("vec_id").as("nn_id"), col("q").as("cq"),
        col("nn").as("cn"), col("bucket").as("cb"))
    val pairs = probes.join(cand,
        col("pb") === col("cb") && col("vec_id") =!= col("nn_id"))
      .select(col("vec_id"), col("bucket"), col("nn_id"),
        cosine(qdot(col("q"), col("cq")), col("nn"), col("cn"))
          .as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nn_id").asc)
    val best = pairs.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1).drop("rk")
    b.select(col("vec_id"), col("bucket"))
      .join(best.select(col("vec_id"), col("nn_id"), col("cos")),
        Seq("vec_id"), "left")
  }

  /** Per-dimension robust statistics of the quantized corpus — the
    * normalization/clipping prep read (which dimensions are skewed,
    * where a robust scaler's center sits): exact min, max, and MEDIAN
    * of each dimension's integer milli-units. The median is exact
    * WITHOUT any per-dimension sort of corpus-sized data: quantized
    * values are integers, so per-(dim, value) counts + a cumulative
    * window over the value-cardinality frame select the lower-median
    * rank directly (the value-histogram selection trick — window
    * partitions hold one row per DISTINCT value, not per vector). */
  def dimStats(emb: DataFrame): DataFrame = {
    val vals = quantized(emb)
      .select(posexplode(col("q")).as(Seq("c", "v")))
      .groupBy(col("c"), col("v")).agg(count(lit(1)).as("cnt"))
      .pinned
    val n = vals.groupBy(col("c")).agg(sum(col("cnt")).as("n"),
      min(col("v")).as("min_q"), max(col("v")).as("max_q"))
    val w = Window.partitionBy(col("c")).orderBy(col("v"))
    val med = vals
      .withColumn("cum", sum(col("cnt")).over(w))
      .join(n.select(col("c"), col("n")), Seq("c"))
      .where(col("cum") >= expr("(n + 1) div 2")) // lower-median rank
      .groupBy(col("c")).agg(min(col("v")).as("median_q"))
    n.join(med, Seq("c"))
      .select(col("c"), col("min_q"), col("max_q"), col("median_q"))
  }

  /** Trained-quantizer cell assignment, exposed for cross-family
    * compositions (cluster-topic labeling joins these cells to the
    * DOCUMENT table): each vector's argmax cell under the
    * [[kmeansCentroidsQ]]-trained centroids — exactly the partition
    * [[semanticDedup]] bounds its candidate pairs with. */
  def cellAssignments(emb: DataFrame, nCentroids: Int = KmSeeds,
      iters: Int = KmIters): DataFrame = {
    val e = quantized(emb).pinned
    rankedAgainst(e, kmeansCentroidsQ(e, nCentroids, iters))
      .where(col("crk") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"))
  }

  /** Per-cell candidate-volume card for the LIVE semantic-dedup path
    * — the monitoring row behind [[semanticDedup]]'s scale contract
    * (and [[indexCellStats]]' live twin): SemDeDup's within-cell
    * pairwise cost is bounded by scaling nCentroids with the corpus,
    * and this card is what tells the operator WHEN — per trained
    * cell, its member count and the exact all-pairs volume
    * semanticDedup will score there (B(B-1)/2). A drifting max is the
    * raise-nCentroids signal; the hub-star cap deliberately does NOT
    * apply here (a cell is a semantic region, not a dup cluster — see
    * [[GroupCap]]), so the bound has to come from the quantizer, and
    * the card keeps that honest. One nCentroids-sized aggregate over
    * the assignment scan. */
  def semanticCellVolume(emb: DataFrame, nCentroids: Int = KmSeeds,
      iters: Int = KmIters): DataFrame =
    cellAssignments(emb, nCentroids, iters)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"))
      .withColumn("n_pairs",
        expr("n_members * (n_members - 1) div 2"))

  /** Nearest-centroid (Rocchio) classification audit: per-label
    * centroids as REQUANTIZED integer means (per-component sum div
    * count — the [[kmeansCentroidsQ]] requantization, so both engines
    * agree bit-for-bit), every vector assigned to its most-cosine-
    * similar label centroid, and the (label, pred) confusion counts
    * reported. The read that says whether labels are separable in
    * embedding space at all — run BEFORE trusting label-conditioned
    * curation. The label-cardinality centroid frame is the one
    * broadcast; assignment is one corpus scan with a pre-trimmed
    * argmax window. */
  def centroidClassify(emb: DataFrame): DataFrame = {
    val e = quantized(emb).pinned
    val cents = e
      .select(col("label"), posexplode(col("q")).as(Seq("c", "v")))
      .groupBy(col("label"), col("c"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .withColumn("m", expr("sv div n"))
      .groupBy(col("label"))
      .agg(expr(
        "transform(sort_array(collect_list(struct(c, m))), r -> r.m)")
        .as("cq"))
      .withColumn("cn",
        aggregate(col("cq"), lit(0L), (acc, x) => acc + x * x))
      .select(col("label").as("pred"), col("cq"), col("cn"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("pred").asc)
    e.join(broadcast(cents))
      .select(col("vec_id"), col("label"), col("pred"),
        cosine(qdot(col("q"), col("cq")), col("nn"), col("cn")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n_vecs"))
  }

  /** Signed-random-projection sketch of the corpus: each vector
    * becomes its `nProj` exact integer dot products against the
    * deterministic hyperplane matrix ([[planes]] — the same ±odd
    * coefficients LSH bucketing signs, kept UNSIGNED here as a dense
    * low-dimensional sketch). Johnson-Lindenstrauss in the cheapest
    * integer form: 64 dims fold to `nProj`, preserving cosine
    * geometry approximately, exactly replayable cross-engine. Only
    * the (nProj x dim) plane matrix broadcasts. */
  private def projected(e: DataFrame, nProj: Int): DataFrame =
    e.select(col("vec_id"), col("label"),
        posexplode(col("q")).as(Seq("c", "qc")))
      .join(broadcast(planes(e, nProj)), Seq("c"))
      .groupBy(col("vec_id"), col("label"), col("plane"))
      .agg(sum(col("qc") * col("coef")).as("pc"))
      .groupBy(col("vec_id"), col("label"))
      .agg(expr(
        "transform(sort_array(collect_list(struct(plane, pc))), r -> r.pc)")
        .as("p"))
      .withColumn("pn",
        aggregate(col("p"), lit(0L), (acc, x) => acc + x * x))

  /** Brute top-k in the PROJECTED space — the dimensionality-reduced
    * serving path (scan cost scales with nProj instead of dim; the
    * price is recall, measured by [[projRecall]]). Same serving shape
    * as [[annTopK]]: bounded query frame broadcast, one corpus scan,
    * pre-trimmed per-query windows. */
  def projTopK(emb: DataFrame, nProj: Int = 16, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val pr = projected(quantized(emb), nProj).pinned
    val q = pr.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("p").as("qv"),
        col("pn").as("qn"))
    val scored = pr.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(qdot(col("qv"), col("p")), col("qn"), col("pn")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("label"),
        col("cos"))
  }

  /** recall@k of the projected-space ranking against the exact
    * full-dimension brute top-k — the JL sketch ships with its recall
    * measurement like every other approximate route. */
  def projRecall(emb: DataFrame, nProj: Int = 16, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val e = quantized(emb).pinned
    val brute = annTopKQ(e, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val pr = projected(e, nProj).pinned
    val q = pr.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("p").as("qv"),
        col("pn").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val approx = pr.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(qdot(col("qv"), col("p")), col("qn"), col("pn")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("vec_id"))
    recallVsBrute(brute, approx, k)
  }

  /** Margin-based parallel-pair mining (Artetxe & Schwenk 2019, the
    * LASER/CCMatrix bitext-mining criterion): a candidate pair (x, y)
    * scores by its cosine RELATIVE to each side's neighborhood —
    *
    *   margin(x,y) = cos(x,y) / (avg_{z in NNk(x)} cos(x,z)
    *                             + avg_{z in NNk(y)} cos(y,z))
    *
    * — which suppresses hubs (vectors close to everything) that
    * absolute-threshold mining over-selects. A pair is MINED when each
    * side is the other's margin-argmax (mutual best), the
    * forward+backward intersection the paper recommends.
    *
    * Cross-engine determinism: each cosine (one IEEE division of
    * exact integers) quantizes to micro-units cq = floor(cos*1e6)
    * BEFORE any sum, so neighborhood sums are exact BIGINTs and the
    * margin is one integral division,
    * margin_q = cq*2k*1000 div (sum_topk_x + sum_topk_y) — permille
    * of the paper's ratio. Pairs with non-positive cosine never mine,
    * and the margin denominator must be positive: the gate is on the
    * SUMMED neighborhood mass (sum_a + sum_b > 0), so one side's
    * negative neighborhood sum is tolerated when the other side's
    * mass outweighs it — the combined-mass denominator is what the
    * ratio divides by, so that is what must clear zero.
    *
    * The two sides here are the even/odd vec_id halves (standing in
    * for the two languages of a bitext run). This is the BRUTE
    * baseline: one side broadcast, like [[nearDupCosineBrute]] — the
    * scale path swaps the candidate cross-join for any bucketed
    * generator ([[bucketed]] co-bucket pairs, [[ivfTopKWith]]
    * probe-cell candidates) and keeps everything downstream, since
    * top-k sums, margins, and the mutual-best windows are all keyed
    * per-vector (WindowGroupLimit pre-trims, no global sort). */
  def marginMine(emb: DataFrame, kNn: Int = 4): DataFrame = {
    require(kNn > 0, "kNn must be positive")
    val e = quantized(emb).pinned
    val a = e.where(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("vec_a"), col("q").as("qa"),
        col("nn").as("na"))
    val b = e.where(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("vec_b"), col("q").as("qb"),
        col("nn").as("nb"))
    val scored = a.join(broadcast(b))
      .select(col("vec_a"), col("vec_b"),
        floor(cosine(qdot(col("qa"), col("qb")), col("na"), col("nb"))
          * 1000000L).as("cq"))
    mineMargins(scored, kNn)
  }

  /** The scale twin of [[marginMine]]: candidate pairs come from
    * hyperplane co-bucketing ([[bucketed]]) instead of the full
    * cross — the standard ANN approximation of the margin criterion
    * (neighborhood sums run over the CANDIDATES each side actually
    * sees, exactly as a FAISS-backed LASER miner approximates them
    * over retrieved neighbors). Nothing corpus-sized broadcasts: the
    * plane matrix is the one broadcast (nPlanes x dim by
    * construction), candidates join by a keyed shuffle on `bucket`,
    * and everything downstream of the candidate frame is shared with
    * the brute baseline — identical margins whenever the bucket
    * recall captures the same candidate sets (identical vectors
    * always co-bucket). */
  def marginMineLsh(emb: DataFrame, kNn: Int = 4,
      nPlanes: Int = NPlanes): DataFrame = {
    require(kNn > 0, "kNn must be positive")
    val bk = bucketed(emb, nPlanes).pinned
    val a = bk.where(col("vec_id") % 2 === 0)
      .select(col("bucket"), col("vec_id").as("vec_a"),
        col("q").as("qa"), col("nn").as("na"))
    val b = bk.where(col("vec_id") % 2 === 1)
      .select(col("bucket"), col("vec_id").as("vec_b"),
        col("q").as("qb"), col("nn").as("nb"))
    val scored = a.join(b, Seq("bucket"))
      .select(col("vec_a"), col("vec_b"),
        floor(cosine(qdot(col("qa"), col("qb")), col("na"), col("nb"))
          * 1000000L).as("cq"))
    mineMargins(scored, kNn)
  }

  /** Shared back half of the margin miners: neighborhood top-k sums
    * per side, permille margin by one integral division, mutual-best
    * intersection. Every stage is keyed per-vector — the rank<=k
    * windows pre-trim per partition (WindowGroupLimit), the sums and
    * argmax joins shuffle on vec_a/vec_b — so the back half scales
    * with the CANDIDATE count regardless of how candidates were
    * generated. */
  private def mineMargins(scoredPairs: DataFrame, kNn: Int): DataFrame = {
    val scored = scoredPairs.pinned
    val wa = Window.partitionBy(col("vec_a"))
      .orderBy(col("cq").desc, col("vec_b").asc)
    val sumA = scored.withColumn("rk", row_number().over(wa))
      .where(col("rk") <= kNn)
      .groupBy(col("vec_a")).agg(sum(col("cq")).as("sum_a"))
    val wb = Window.partitionBy(col("vec_b"))
      .orderBy(col("cq").desc, col("vec_a").asc)
    val sumB = scored.withColumn("rk", row_number().over(wb))
      .where(col("rk") <= kNn)
      .groupBy(col("vec_b")).agg(sum(col("cq")).as("sum_b"))
    val margins = scored
      .join(sumA, Seq("vec_a")).join(sumB, Seq("vec_b"))
      .where(col("cq") > 0 && col("sum_a") + col("sum_b") > 0)
      .withColumn("margin_q",
        expr(s"cq * ${2L * kNn} * 1000 div (sum_a + sum_b)"))
      .select(col("vec_a"), col("vec_b"), col("cq"), col("margin_q"))
      .pinned
    val bestFwd = margins.withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_a"))
          .orderBy(col("margin_q").desc, col("vec_b").asc)))
      .where(col("rk") === 1).drop("rk")
    val bestBwd = margins.withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_b"))
          .orderBy(col("margin_q").desc, col("vec_a").asc)))
      .where(col("rk") === 1)
      .select(col("vec_a"), col("vec_b"))
    bestFwd.join(bestBwd, Seq("vec_a", "vec_b"))
      .select(col("vec_a"), col("vec_b"), col("cq"), col("margin_q"))
  }

  /** Contrastive hard-negative mining — for each query vector, the k
    * most-similar vectors with a DIFFERENT label (the negatives that
    * sit closest to the decision boundary, the standard pick for
    * contrastive/embedding training batches: random negatives are too
    * easy to carry gradient). Same serving shape as [[annTopK]] —
    * query side bounded by nQueries and broadcast, corpus scanned
    * once, per-query top-k via a pre-trimmed window — with the label
    * inequality folded into the join predicate so same-label rows
    * never leave the scan. */
  def hardNegatives(emb: DataFrame, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val e = quantized(emb)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("q").as("qv"), col("nn").as("qn"))
    val scored = e.join(broadcast(q), col("label") =!= col("qlabel"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(qdot(col("qv"), col("q")), col("qn"), col("nn")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("label"),
        col("cos"))
  }
}
