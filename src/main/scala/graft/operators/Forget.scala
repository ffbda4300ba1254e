package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten sweep — ONE call that removes a document set
  * from every persisted artifact a curation deployment accumulates:
  * serving indexes (MinHash near-dup, BM25, the IVF vector family),
  * per-record streaming registries, and the additive model states
  * (via payload-verified exact subtraction). Crawl pipelines field
  * deletion requests routinely; without a sweep, every artifact is a
  * separate chance to forget one.
  *
  * Each target uses its own verified deletion primitive
  * ([[EmbeddingOps.indexDelete]]'s tombstone segments,
  * graft.streaming.Streams.stateDelete, the per-sink
  * `*StateDelete` subtraction routes), so the sweep adds
  * orchestration and ACCOUNTING, not new deletion semantics. Targets
  * execute independently: one refusing target does not block the
  * others' deletions (a doc half-forgotten because an unrelated state
  * was misconfigured is worse than a loudly incomplete sweep), and
  * the sweep then THROWS an aggregate error naming every failed
  * target — silent partial completion is never an outcome. Pass
  * `requireComplete = false` to get the report back for inspection
  * instead.
  *
  * Caveats inherited from the primitives, restated: index/registry
  * tombstones mask immediately and are applied physically by the
  * compaction family; deletion is also re-admission (route future
  * ingests through an upstream filter when the forgetting must be
  * permanent); additive targets need the docs' ORIGINAL content
  * (verified against the registry hash). Same maintenance-window
  * contract as every maintainer: one sweep at a time, streams
  * quiesced. */
object Forget {

  sealed trait Target { def path: String }

  /** A persisted index root (MinHash, BM25, IVF/PQ/SQ8/IVF-PQ):
    * deletion lands as crash-atomic tombstone segments keyed by
    * `keyCol` (doc_id for the text indexes, vec_id for the vector
    * family — `docs` must carry the column). */
  final case class IndexTarget(path: String,
      keyCol: String = "doc_id") extends Target

  /** A per-record registry fold state (minhashSink / embeddingSink):
    * tombstone deletion over the fold protocol; the state's own
    * schema decides its key. */
  final case class RegistryStateTarget(path: String) extends Target

  /** An additive model fold state, deleted by payload-verified exact
    * subtraction. `kind` picks the fold's spec: one of `lm`,
    * `trigram`, `dsir`, `nb`, `linedf`, `corpus`, `bm25`. */
  final case class AdditiveStateTarget(path: String,
      kind: String) extends Target

  private val AdditiveKinds: Map[String,
      (SparkSession, String, DataFrame) => Unit] = Map(
    "lm" -> (graft.streaming.Streams.lmStateDelete(_, _, _)),
    "trigram" -> (graft.streaming.Streams.lmTrigramStateDelete(_, _, _)),
    "dsir" -> (graft.streaming.Streams.dsirStateDelete(_, _, _)),
    "nb" -> (graft.streaming.Streams.nbStateDelete(_, _, _)),
    "linedf" -> (graft.streaming.Streams.lineDfStateDelete(_, _, _)),
    "corpus" -> (graft.streaming.Streams.corpusStateDelete(_, _, _)),
    "bm25" -> (graft.streaming.Streams.bm25StateDelete(_, _, _)))

  /** Run the sweep. Returns one report row per target:
    * (target_path, target_kind, status "deleted"/"failed", detail).
    * Throws AFTER attempting every target if any failed and
    * `requireComplete` (the default) — the error names each failure;
    * the successful targets' deletions stand either way. */
  def forgetDocs(s: SparkSession, targets: Seq[Target],
      docs: DataFrame, requireComplete: Boolean = true): DataFrame = {
    require(targets.nonEmpty, "forgetDocs needs at least one target")
    val pinned = docs.localCheckpoint() // one payload read, N targets
    val results = targets.map { t =>
      val kind = t match {
        case _: IndexTarget => "index"
        case _: RegistryStateTarget => "registry_state"
        case a: AdditiveStateTarget => s"additive_state:${a.kind}"
      }
      val outcome =
        try {
          t match {
            case IndexTarget(path, keyCol) =>
              EmbeddingOps.indexDelete(s, path,
                pinned.select(col(keyCol)), keyCol = keyCol)
            case RegistryStateTarget(path) =>
              graft.streaming.Streams.stateDelete(s, path, pinned)
            case AdditiveStateTarget(path, k) =>
              AdditiveKinds.getOrElse(k, throw new IllegalArgumentException(
                s"unknown additive fold kind '$k' — expected one of " +
                  AdditiveKinds.keys.toSeq.sorted.mkString(", ")))
                .apply(s, path, pinned)
          }
          Right(())
          // e.toString, not getMessage: getMessage can be null (NPE),
        // which would put a null detail in the report and a
        // "kind at path: null" line in the aggregate error
      } catch { case e: Exception => Left(e.toString) }
      (t.path, kind, outcome)
    }
    val failed = results.collect { case (p, k, Left(msg)) =>
      s"$k at $p: $msg" }
    if (requireComplete)
      require(failed.isEmpty,
        s"forget sweep INCOMPLETE — ${failed.size} of ${targets.size} " +
          "target(s) failed (the others' deletions stand):\n  " +
          failed.mkString("\n  "))
    import s.implicits._
    results.map { case (p, k, o) =>
      (p, k, if (o.isRight) "deleted" else "failed",
        o.left.toOption.getOrElse(""))
    }.toDF("target_path", "target_kind", "status", "detail")
  }
}
