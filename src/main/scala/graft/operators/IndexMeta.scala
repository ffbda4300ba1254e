package graft.operators

/** In-session cache of EPOCH-IMMUTABLE persisted-index metadata — the
  * serving family's driver-side job-count fix.
  *
  * Every index serve used to re-execute the same tiny metadata reads
  * as Spark jobs on every call: the `params` `.head` (one job), the
  * quantizer-table scans feeding broadcasts (a scan job inside each
  * broadcast exchange), the summed `totals` row (a scan+agg job). At
  * one serve that is noise; at serving cadence it is the dominant
  * latency term — a hybrid serve planned 42 jobs, a large share of
  * them re-reads of values that cannot have changed — and each job is
  * a driver round-trip, which is exactly the latency that multiplies
  * on a pressured driver or a remote object store.
  *
  * What may cache, stated as a rule: ONLY values that are immutable
  * for a given (base path, epoch) — the write-once `params`, the
  * quantizer tables (centroids/codebooks, replaced only by
  * epoch-bumping full-tree swaps) — or values keyed additionally by
  * the EXACT segment set they were computed from (the summed totals:
  * per-segment rows are immutable, so the sum over a named set is
  * immutable even while appends land). Segment MANIFESTS and
  * tombstone sets must NEVER cache here: appends and deletes change
  * them without bumping the epoch, and a cross-process maintainer's
  * appends must stay visible to this session's serves.
  *
  * Invalidation is belt and braces: the epoch in the key is the
  * natural invalidator (every full-tree swap bumps it — a swap from
  * ANY process moves readers to a new key), and this session's own
  * mutation doors additionally drop the path's entries
  * ([[IndexMetaCache.invalidate]] from commitGen/publishStaged), so
  * an in-session delete-root-and-rebuild that lands on a
  * previously-seen epoch number cannot resurrect stale values. The
  * one uncovered corner, documented loudly: an OUT-OF-PROCESS
  * `rm -rf root` + rebuild that reaches a previously-cached epoch
  * number while this session keeps serving. That sequence is not a
  * protocol operation (the doors only move epochs forward) and
  * already violates the single-maintainer window; route rebuilds
  * through the doors.
  *
  * Bounded: entries are small by the rule above (an Int, a 2-long
  * row, centroid/codebook rows bounded by construction parameters),
  * and eviction past the bound is true LRU — the least-recently-used
  * entry leaves, so a long-lived serving session over more roots than
  * the bound keeps its hot set instead of thrashing every entry at a
  * wholesale clear. The cache is an optimization; a cold read
  * follows every eviction. */
private[graft] class MetaCache(maxEntries: Int) {
  require(maxEntries > 0, s"maxEntries must be positive, got $maxEntries")

  // access-ordered LinkedHashMap = the LRU, guarded by its own
  // monitor. `load` runs OUTSIDE the lock: concurrent serves of
  // different roots never serialize behind each other's metadata
  // Spark jobs; two racing loads of the SAME key both compute (the
  // contract says values are immutable for their key, so either
  // result is correct) and the first put wins.
  private val m = new java.util.LinkedHashMap[
      (String, Long, String), AnyRef](64, 0.75f, true) {
    override protected def removeEldestEntry(
        e: java.util.Map.Entry[(String, Long, String), AnyRef])
        : Boolean = size() > maxEntries
  }
  // per-base invalidation counters: a load that began BEFORE an
  // invalidate() must not be cached AFTER it (the load may carry the
  // pre-mutation value under a colliding epoch — exactly the stale
  // resurrection invalidate() exists to prevent; removing entries
  // alone cannot stop an in-flight load's later put). Grows with the
  // distinct roots this session MUTATED — the same order as the
  // cache's own key space; entries are never removed because the
  // stamp comparison relies on monotonicity.
  private val inval = scala.collection.mutable.HashMap.empty[String, Long]

  /** The cached value for (`base`, `epoch`, `kind`), computing and
    * remembering it on first use. `load` must yield a value that is
    * immutable for this key per the object contract above. A load
    * that raced an [[invalidate]] still RETURNS (this call started
    * before the mutation — the pre-fix semantics for in-flight
    * reads) but is NOT remembered: the next call reloads fresh. */
  def cached[T <: AnyRef](base: String, epoch: Long, kind: String)(
      load: => T): T = {
    val k = (base, epoch, kind)
    val (hit, stamp) = m.synchronized(
      (m.get(k), inval.getOrElse(base, 0L)))
    if (hit != null) return hit.asInstanceOf[T]
    val v = load
    m.synchronized {
      val again = m.get(k)
      if (again != null) again.asInstanceOf[T]
      else if (inval.getOrElse(base, 0L) != stamp) v // raced: serve, don't cache
      else { m.put(k, v); v }
    }
  }

  /** Drop every entry of `base` — called by this session's mutation
    * doors so an in-session rebuild at a reused path can never serve
    * a stale value, whatever epoch number it lands on. Bumps the
    * base's invalidation stamp so in-flight loads cannot re-insert
    * what they read before the mutation. */
  def invalidate(base: String): Unit = m.synchronized {
    val it = m.keySet.iterator()
    while (it.hasNext) if (it.next()._1 == base) it.remove()
    inval(base) = inval.getOrElse(base, 0L) + 1L
    ()
  }

  /** Test hook: a clean slate between fixtures. */
  private[graft] def clearAll(): Unit = m.synchronized(m.clear())

  /** Test hook: the live keys, least-recently-used first. */
  private[graft] def keysNow: Seq[(String, Long, String)] =
    m.synchronized {
      val b = Seq.newBuilder[(String, Long, String)]
      m.keySet.forEach(k => b += k)
      b.result()
    }
}

private[graft] object IndexMetaCache extends MetaCache(4096)
