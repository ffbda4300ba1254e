package graft.operators

import org.apache.spark.sql.Dataset

/** Lineage pinning for multi-consumer intermediates.
  *
  * `localCheckpoint()` truncates lineage into executor-local storage —
  * the right call on local[*], where executors cannot be lost, and the
  * cheapest way to stop a shared shuffle from being recomputed per
  * consumer. On a real cluster an executor failure LOSES those blocks
  * and fails the job instead of recomputing it, so deployments that
  * can lose executors set `spark.graft.reliableCheckpoint=true` (plus
  * `sparkContext.setCheckpointDir(...)`): every pin site in the engine
  * then uses reliable `checkpoint()`, which persists the blocks to the
  * checkpoint dir's fault-tolerant storage and survives executor loss.
  * One flag flips every site; the default stays local because the
  * reliable form costs a storage round-trip per pinned frame.
  */
private[graft] object Stage {
  val ReliableFlag = "spark.graft.reliableCheckpoint"

  implicit final class PinOps[T](private val ds: Dataset[T])
      extends AnyVal {
    /** Pin this frame for its multiple consumers: reliable
      * checkpoint under [[ReliableFlag]], executor-local otherwise. */
    def pinned: Dataset[T] =
      if (ds.sparkSession.conf.get(ReliableFlag, "false").toBoolean)
        ds.checkpoint()
      else ds.localCheckpoint()
  }
}
