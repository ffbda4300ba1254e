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
  * compaction family; for [[IndexTarget]]s the sweep ALSO expires
  * every pinned view of the index ([[EmbeddingOps.snapshotInvalidate]]
  * — pre-sweep snapshot tokens and run manifests refuse with
  * "snapshot expired" instead of replaying the forgotten payload;
  * re-pin after the sweep); deletion alone is also re-admission — include a
  * [[LedgerTarget]] in the sweep and compose [[forgottenFilter]] at
  * the ingest/curate front door when the forgetting must be
  * permanent; additive targets need the docs' ORIGINAL content
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

  /** A persisted forget-ledger ([[ledgerInit]]): the sweep APPENDS the
    * forgotten keys so the ingest/curate front door's
    * [[forgottenFilter]] refuses them forever — the re-admission
    * guard the index/state deletions alone cannot give (their
    * tombstones clear at compaction, after which a re-ingested
    * byte-identical doc would resurrect). */
  final case class LedgerTarget(path: String,
      keyCol: String = "doc_id") extends Target

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
        case _: LedgerTarget => "ledger"
      }
      val outcome =
        try {
          t match {
            case IndexTarget(path, keyCol) =>
              EmbeddingOps.indexDelete(s, path,
                pinned.select(col(keyCol)), keyCol = keyCol)
              // a forgotten doc must not be replayable through a
              // pre-sweep snapshot token or run manifest: ordinary
              // tombstones deliberately leave pinned views intact
              // (training runs keep their corpus view across
              // maintenance deletes), so the sweep expires them
              // explicitly — an O(1) in-place epoch bump, never a
              // per-sweep index rewrite. Post-sweep snapshots pin the
              // swept view and serve normally. A crash between the
              // (crash-atomic) delete and this bump is healed by
              // retrying the sweep, the standard incomplete-sweep
              // protocol either way.
              EmbeddingOps.snapshotInvalidate(s, path)
            case RegistryStateTarget(path) =>
              graft.streaming.Streams.stateDelete(s, path, pinned)
            case LedgerTarget(path, keyCol) =>
              ledgerAppend(s, path, pinned.select(col(keyCol)), keyCol)
            case AdditiveStateTarget(path, k) =>
              AdditiveKinds.getOrElse(k, throw new IllegalArgumentException(
                s"unknown additive fold kind '$k' — expected one of " +
                  AdditiveKinds.keys.toSeq.sorted.mkString(", ")))
                .apply(s, path, pinned)
          }
          Right(())
        } catch {
          // e.toString, not getMessage: getMessage can be null (NPE),
          // which would put a null detail in the report and a
          // "kind at path: null" line in the aggregate error
          case e: Exception => Left(e.toString)
        }
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

  // ---- persisted forget-ledger (re-admission guard) --------------------
  // The index/state deletions above are REVOCABLE by re-ingestion:
  // their tombstones apply physically at compaction and clear, after
  // which a byte-identical re-delivery of a forgotten doc folds as
  // new and resurrects it everywhere. GDPR-facing crawl pipelines
  // need the opposite default — once forgotten, a doc stays out until
  // a human says otherwise — so the forgotten keys persist in their
  // own append-only ledger and the ingest/curate FRONT DOOR anti-joins
  // it before any index or state is touched.

  /** Initialize an empty forget-ledger at `path` — one empty committed
    * generation, so [[forgottenFilter]] can tell "nothing forgotten
    * yet" apart from a typo'd path (which it refuses loudly: a GDPR
    * front door that silently admits everything because its ledger
    * path was misspelled is the worst failure mode this family has).
    * Idempotent on an existing ledger. */
  def ledgerInit(s: SparkSession, path: String): Unit = {
    val (fs, root) = EmbeddingOps.fsFor(s, path)
    val metaDir = new org.apache.hadoop.fs.Path(root, "_dels")
    val (g, _) = EmbeddingOps.committedSegs(fs, metaDir)
    if (g < 0)
      // two concurrent initializers race the gen-0 CAS; the loser's
      // outcome (another writer committed the canonical empty gen-0)
      // IS this call's idempotent success — swallow after re-checking
      try EmbeddingOps.commitGen(fs, metaDir, 0, Seq.empty)
      catch {
        case e: IllegalStateException =>
          if (EmbeddingOps.committedSegs(fs, metaDir)._1 < 0) throw e
      }
  }

  /** Append keys to a forget-ledger: the tombstone-segment append
    * protocol ([[EmbeddingOps.indexDelete]]'s), so the ledger write is
    * CRASH-ATOMIC and O(batch) — a kill anywhere leaves the committed
    * key set unchanged; the retry completes. Keys are append-only by
    * design (un-forgetting is a human decision outside this API);
    * one appender at a time, like every segment maintainer. */
  def ledgerAppend(s: SparkSession, path: String, ids: DataFrame,
      keyCol: String = "doc_id"): Unit = {
    val (fs, root) = EmbeddingOps.fsFor(s, path)
    // Mirror ledgerKeys' guard: tombstoneAppend bootstraps from gen -1,
    // so an uninitialized/typo'd path would silently BECOME a new
    // ledger here — the sweep would report "deleted" while the real
    // ledger never received the keys and the front door re-admits the
    // docs. The write side must refuse exactly like the read side.
    val (g, _) = EmbeddingOps.committedSegs(fs,
      new org.apache.hadoop.fs.Path(root, "_dels"))
    require(g >= 0,
      s"no forget-ledger at $path — ledgerInit it first (appending to " +
        "a missing ledger would silently create a ledger nobody reads)")
    EmbeddingOps.tombstoneAppend(s, root, ids, keyCol)
  }

  /** The committed forgotten-key set — unbounded by construction
    * (forget mass grows with deletion-request churn), so callers
    * anti-join it ([[forgottenFilter]]), never collect it. Requires
    * an initialized ledger. */
  def ledgerKeys(s: SparkSession, path: String,
      keyCol: String = "doc_id",
      keyType: Option[org.apache.spark.sql.types.DataType] = None)
      : DataFrame = {
    val (fs, root) = EmbeddingOps.fsFor(s, path)
    val (g, _) = EmbeddingOps.committedSegs(fs,
      new org.apache.hadoop.fs.Path(root, "_dels"))
    require(g >= 0,
      s"no forget-ledger at $path — ledgerInit it first (a missing " +
        "ledger must refuse, not silently admit everything)")
    val keys = EmbeddingOps.tombstones(s, path, keyCol)
    // The empty-ledger frame is hardcoded LongType (s.range(0));
    // LedgerTarget permits any key column, so without a cast the
    // empty-ledger and populated-ledger plans would carry different
    // join-key types and lean on implicit casts. Callers that know
    // their key type (forgottenFilter does) pass it so both paths are
    // type-identical.
    keyType.fold(keys)(t => keys.select(col(keyCol).cast(t).as(keyCol)))
  }

  /** Number of committed forgotten keys — a bounded accounting scalar
    * for sweep reports and maintenance dashboards. */
  def ledgerSize(s: SparkSession, path: String,
      keyCol: String = "doc_id"): Long =
    ledgerKeys(s, path, keyCol).distinct().count()

  /** The front-door re-admission guard: drop every row whose `keyCol`
    * is in the forget-ledger. Compose it FIRST in any ingest/curate
    * chain that feeds indexes or states — a forgotten doc must be
    * filtered before any artifact sees it. Scale shape: one keyed
    * anti-join (the ledger is data-derived and unbounded, so it is
    * never broadcast by hint; the batch side is the ingest batch). */
  def forgottenFilter(df: DataFrame, ledgerPath: String,
      keyCol: String = "doc_id"): DataFrame =
    df.join(ledgerKeys(df.sparkSession, ledgerPath, keyCol,
        keyType = Some(df.schema(keyCol).dataType)),
      Seq(keyCol), "left_anti")
}
