package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import java.util.concurrent.ConcurrentHashMap

/** Deterministic release handle for the frames graft operators pin with
  * `persist(MEMORY_AND_DISK)` (MinHash signature frames in
  * [[graft.dedup.Dedup]], the tokenized projection in
  * [[graft.text.Bm25]]). The persists exist for computed-once semantics
  * inside one operator call — ReusedExchange is an optimizer outcome, not
  * a guarantee (see the Dedup.minhashLsh lifecycle note) — but each call
  * over a DIFFERENT input frame pins a new CacheManager entry for the
  * session's lifetime. A bench harness sweeps with `clearCache()`; a
  * long-lived library session should not have to nuke every cache it owns
  * to release ours.
  *
  * The registry is keyed PER SparkSession: [[releaseFor]] unpersists
  * exactly one session's graft-pinned frames, so a library session
  * releasing its own pins can never evict frames another live session in
  * the same JVM still uses. [[release]] (no session) is the harness sweep —
  * every session, typically between bench reps in a single-session JVM.
  * Re-pinning the same frame is idempotent on both the persist
  * (CacheManager reuses the canonical-plan entry) and the registry
  * (identity set).
  */
object PinnedCaches {
  private val bySession =
    new ConcurrentHashMap[SparkSession, java.util.Set[DataFrame]]()

  /** Persist `df` MEMORY_AND_DISK and register it (under its own session)
    * for [[releaseFor]]/[[release]].
    */
  private[graft] def pin(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    bySession.computeIfAbsent(df.sparkSession,
      _ => java.util.Collections.newSetFromMap(
        new ConcurrentHashMap[DataFrame, java.lang.Boolean]())).add(df)
    df
  }

  /** Unpersist every frame graft operators have pinned in `session` and
    * drop its registry entry; other sessions' pins are untouched.
    * `blocking = true` waits for block removal.
    */
  def releaseFor(session: SparkSession, blocking: Boolean = false): Unit = {
    val frames = bySession.remove(session)
    if (frames != null) drain(frames, blocking)
  }

  /** Unpersist every frame graft operators have pinned in this JVM, across
    * ALL sessions, and clear the registry — the bench/test sweep. In a
    * multi-session JVM prefer [[releaseFor]]: a global sweep makes other
    * live sessions recompute on next use (a cost, never a wrongness).
    */
  def release(blocking: Boolean = false): Unit = {
    val it = bySession.keySet().iterator()
    while (it.hasNext) {
      val frames = bySession.remove(it.next())
      if (frames != null) drain(frames, blocking)
    }
  }

  /** A frame whose session has already been stopped throws on unpersist;
    * that must not strand the rest of the set pinned, so each unpersist is
    * isolated and the entry is removed either way.
    */
  private def drain(frames: java.util.Set[DataFrame], blocking: Boolean): Unit = {
    val it = frames.iterator()
    while (it.hasNext) {
      val frame = it.next()
      try frame.unpersist(blocking)
      catch { case scala.util.control.NonFatal(_) => () } // stopped session: nothing left to release
      it.remove()
    }
  }

  /** Frames currently pinned (registered and not yet released), across all
    * sessions.
    */
  def pinnedCount: Int = {
    var n = 0
    bySession.values().forEach(s => n += s.size)
    n
  }
}
