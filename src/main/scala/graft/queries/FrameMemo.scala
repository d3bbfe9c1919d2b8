package graft.queries

import org.apache.spark.sql.{DataFrame, GraftSqlShim}

/** LRU memo of materialized (localCheckpoint'd) DataFrames — the
  * materialized-view registry a long-lived session keeps for shared
  * intermediates (dedup graphs, ANN index artifacts).
  *
  * Past `bound` entries the LEAST-RECENTLY-USED memo is evicted and
  * its checkpointed RDD unpersisted (blocks freed, not GC-deferred) —
  * unlike a wholesale clear(), a session that crosses the bound loses
  * only its coldest frame and re-pays only that build. Rebuild is
  * always safe: every memo is a pure function of its key's inputs.
  *
  * VALIDITY CONTRACT: a returned frame is executable until `bound`
  * OTHER keys have been built after it was last accessed. Eviction
  * unpersists checkpoint blocks that have no lineage to recompute, so
  * a DIRECT reference held across more than `bound` subsequent builds
  * and executed afterwards fails with missing blocks — re-fetch
  * through `apply` instead (a post-eviction fetch simply rebuilds).
  * Consumers here (Verify/Bench queries) execute their frames within
  * the same query, far inside the window.
  *
  * Thread-safe; the monitor is reentrant, so a build may resolve other
  * keys of the SAME memo (outer-before-inner still recommended so the
  * LRU order reflects true access recency).
  */
final class FrameMemo[K](bound: Int) {
  require(bound >= 1, s"bound must be >= 1, got $bound")

  private val map = new java.util.LinkedHashMap[K, DataFrame](
    16, 0.75f, /* accessOrder = */ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[K, DataFrame]): Boolean =
      if (size() > bound) { GraftSqlShim.unpersistCheckpoint(e.getValue); true }
      else false
  }

  /** Memoized lookup: returns the materialized frame for `k`, running
    * `build` (then localCheckpoint) only on first access or after
    * eviction.
    */
  def apply(k: K)(build: => DataFrame): DataFrame = map.synchronized {
    val cur = map.get(k) // refreshes LRU order on hit
    if (cur != null) cur
    else {
      val built = build.localCheckpoint()
      map.put(k, built)
      built
    }
  }

  def size: Int = map.synchronized(map.size())

  /** Evict everything, unpersisting every held checkpoint. */
  def clear(): Unit = map.synchronized {
    map.values().forEach(GraftSqlShim.unpersistCheckpoint(_))
    map.clear()
  }
}
