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

  private val pendingRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]

  /** Eagerly `localCheckpoint` `df` and register the checkpointed blocks
    * for the [[unpersistCaches]] sweep. Use INSTEAD of [[persistTracked]]
    * when the frame is reused across several downstream ACTIONS and its
    * producing plan is large: persist keeps the full child plan inside
    * the InMemoryRelation, so every downstream action re-analyzes,
    * re-optimizes and (under AQE) re-stringifies the whole upstream tree;
    * the checkpoint truncates it to a LogicalRDD leaf (the r11 q105
    * finding — plan machinery, not execution, dominated). Same
    * fault-tolerance trade as every localCheckpoint (see
    * [[graft.graph.LinkGraph.pageRank]]'s scaladoc): blocks live on
    * executors, lineage is gone, an executor loss mid-query fails the
    * job instead of recomputing.
    */
  private[graft] def checkpointTracked(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => pendingRdds.add(lr.rdd)
      case _ => ()
    }
    cp
  }

  /** Unpersist every tracked cache created since the last call — see the
    * class doc for the call-after-materializing contract.
    */
  def unpersistCaches(blocking: Boolean = false): Unit = {
    var d = pendingCaches.poll()
    while (d != null) { d.unpersist(blocking); d = pendingCaches.poll() }
    var r = pendingRdds.poll()
    while (r != null) { r.unpersist(blocking); r = pendingRdds.poll() }
  }
}
