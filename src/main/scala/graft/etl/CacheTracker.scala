package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for operator-internal caches.
  *
  * Several operators persist an intermediate frame because the plan they
  * RETURN reads it more than once (candidate-pair prunes in
  * [[graft.dedup.Dedup]], the edge/out-degree frames in
  * [[graft.graph.LinkGraph.pageRank]], the scored frame in
  * [[graft.text.PerplexityBuckets]]). The returned plan is lazy, so the
  * operator cannot unpersist before returning — Spark's CacheManager
  * would evict the cache before the caller ever ran the query — and
  * Spark holds such entries for the session lifetime.
  *
  * Contract: a long-lived session should call [[unpersistCaches]] after
  * MATERIALIZING each operator result (write / collect); calling it
  * earlier is safe but downgrades the cached reads to recomputation.
  * One-shot jobs can ignore this entirely — the cache dies with the
  * session. Every public operator that registers a cache says so in its
  * own scaladoc.
  */
object CacheTracker {

  private val pendingCaches = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and register it for a later
    * [[unpersistCaches]] sweep.
    */
  private[graft] def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    pendingCaches.add(p)
    p
  }

  /** Unpersist every tracked cache created since the last call — see the
    * class doc for the call-after-materializing contract.
    */
  def unpersistCaches(blocking: Boolean = false): Unit = {
    var d = pendingCaches.poll()
    while (d != null) { d.unpersist(blocking); d = pendingCaches.poll() }
  }
}
