package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deterministic release handle for the frames graft operators pin with
  * `persist(MEMORY_AND_DISK)` (MinHash signature frames in
  * [[graft.dedup.Dedup]], the tokenized projection in
  * [[graft.text.Bm25]]). The persists exist for computed-once semantics
  * inside one operator call — ReusedExchange is an optimizer outcome, not
  * a guarantee (see the Dedup.minhashLsh lifecycle note) — but each call
  * over a DIFFERENT input frame pins a new CacheManager entry for the
  * session's lifetime. A bench harness sweeps with `clearCache()`; a
  * long-lived library session should not have to nuke every cache it owns
  * to release ours. Every operator-pinned frame registers here, so
  * [[release]] unpersists exactly the graft-pinned set and nothing else.
  *
  * The registry is JVM-global (one entry set across sessions — matching
  * CacheManager, which is per-SparkSession but keyed by canonicalized
  * plan): strong references, explicitly released. Re-pinning the same
  * frame is idempotent on both the persist (CacheManager reuses the
  * canonical-plan entry) and the registry (identity set).
  */
object PinnedCaches {
  private val frames = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

  /** Persist `df` MEMORY_AND_DISK and register it for [[release]]. */
  private[graft] def pin(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    frames.add(df)
    df
  }

  /** Unpersist every frame graft operators have pinned in this JVM and
    * clear the registry. `blocking = true` waits for block removal.
    *
    * JVM-global scope: the registry spans SparkSessions, so `release()`
    * from one session also unpersists frames another live session pinned
    * (they recompute on next use — a cost, never a wrongness). A frame
    * whose session has already been stopped throws on unpersist; that
    * must not strand the rest of the registry pinned, so each unpersist
    * is isolated and the entry is removed either way.
    */
  def release(blocking: Boolean = false): Unit = {
    val it = frames.iterator()
    while (it.hasNext) {
      val frame = it.next()
      try frame.unpersist(blocking)
      catch { case scala.util.control.NonFatal(_) => () } // stopped session: nothing left to release
      it.remove()
    }
  }

  /** Frames currently pinned (registered and not yet released). */
  def pinnedCount: Int = frames.size
}
