package graft.operators

import graft.operators.Stage.PinOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared persisted-index segment protocol: generation
  * manifests, crash-atomic staged appends, tombstone segments, and
  * the generic compaction — the machinery every persisted index
  * family (IVF/PQ/IVF-PQ/SQ8/trunc tier, and the text indexes via
  * [[TextOps]]) builds on. Split from [[EmbeddingOps]] purely
  * mechanically. */
private[graft] trait EmbSegmentOps { this: EmbeddingOps.type =>

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
}
