package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of OPERATOR-INTERNAL persisted frames — the
  * releasable handle the centralized-cleanup contract (Dedup header
  * doc) promises callers.
  *
  * Operators persist intermediate frames (shingle indexes, gram
  * explodes, sketch frames) that the RETURNED lazy DataFrame still
  * reads, so an in-operator unpersist would fire before the caller's
  * action and silently re-derive the frame per consumer. The harnesses
  * (`graft.Verify` / `graft.Bench` / `graft.ScaleProbe`) run
  * `spark.catalog.clearCache()` between queries, but a long-lived
  * interactive session that also persists ITS OWN frames can't use
  * that hammer. [[persisted]] registers each internal persist here
  * (weakly — registration never retains a frame the caller dropped),
  * and [[release]] unpersists exactly the operator-internal survivors,
  * leaving user persists alone.
  */
object Caches {
  // WeakHashMap: identity-keyed, entries vanish once the caller drops
  // the last strong reference — the registry never extends a frame's
  // lifetime, it only remembers live ones so release() can find them.
  private val frames = new java.util.WeakHashMap[DataFrame, Unit]()

  /** Persist `df` at `level` and register it for [[release]]. Returns
    * `df` so call sites read `Caches.persisted(frame)`. */
  def persisted(
      df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      df.persist(level)
      frames.put(df, ())
      df
    }

  /** Unpersist every still-live registered frame (non-blocking) and
    * clear the registry. Safe to call between corpora in a long-lived
    * session; user-persisted frames are untouched. */
  def release(): Unit = synchronized {
    val it = frames.keySet().iterator()
    while (it.hasNext) {
      val df = it.next()
      if (df != null) df.unpersist(false)
    }
    frames.clear()
  }

  /** Number of currently registered (still strongly-referenced)
    * frames — spec hook. */
  def registered: Int = synchronized(frames.size())

  /** Chain-friendly form: `frame.persistRegistered()` keeps the
    * builder chains at the call sites intact. */
  implicit class Registered(private val df: DataFrame) extends AnyVal {
    def persistRegistered(
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
      Caches.persisted(df, level)
  }
}
