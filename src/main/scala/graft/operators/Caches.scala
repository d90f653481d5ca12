package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable.ArrayBuffer

/** Lifecycle registry for operator-internal persisted frames.
  *
  * Operators like [[Dedup.minhashPairs]] cache an intermediate (the
  * shingle-hash frame) because it feeds two plan branches; the returned
  * DataFrame is lazy, so the operator itself can never know when the
  * caller's terminal action has run and the cache can be dropped. In a
  * long-lived session (a bench loop, a notebook, a service) caches that
  * are never released accumulate executor storage and GC pressure.
  *
  * Entry points therefore drain this registry after each query's
  * terminal action ([[graft.Bench]], [[graft.Verify]], and
  * `GraftApi.releaseCaches` for library users).
  */
object Caches {
  private val live = ArrayBuffer.empty[DataFrame]
  private val pinnedFrames = ArrayBuffer.empty[DataFrame]

  /** Persist `df` at `level` and track it for later release. */
  def persistTracked(df: DataFrame,
                     level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      df.persist(level)
      live += df
      df
    }

  /** Persist `df` and PIN it: [[releaseAll]] refuses to drop pinned
    * frames. For the rare frame whose consumers CANNOT recompute from
    * source once the cache is gone ([[graft.sources.Formats.quarantine]]'s
    * corrupt-rows branch — Spark refuses corrupt-column-only scans), so
    * an interleaved pipeline's drain can't break it. Release explicitly
    * with [[releasePinned]] after every branch has been consumed. */
  def persistPinned(df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      df.persist(level)
      pinnedFrames += df
      df
    }

  /** Unpersist every tracked (non-pinned) frame (non-blocking) and
    * clear the registry. A plan that still references a released cache
    * recomputes from source — correct for every operator here; frames
    * that can't recompute are registered via [[persistPinned]] and
    * survive this drain. The registry is process-global: drain it
    * between units of work, not mid-pipeline. */
  def releaseAll(): Unit = synchronized {
    live.foreach(df => try df.unpersist(blocking = false) catch { case _: Throwable => () })
    live.clear()
  }

  /** Unpersist every pinned frame. Call once every consumer of the
    * pinned frames (e.g. both quarantine branches) has landed. */
  def releasePinned(): Unit = synchronized {
    pinnedFrames.foreach(df => try df.unpersist(blocking = false) catch { case _: Throwable => () })
    pinnedFrames.clear()
  }

  /** Number of currently tracked cached frames (for tests). */
  def trackedCount: Int = synchronized(live.size)

  /** Number of currently pinned cached frames (for tests). */
  def pinnedCount: Int = synchronized(pinnedFrames.size)
}
