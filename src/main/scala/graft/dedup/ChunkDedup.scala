package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Chunk-granular exact substring dedup — the distributed-friendly
  * approximation of suffix-array substring dedup (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better"): repeated
  * long spans (boilerplate, licenses, templated passages) are removed
  * EVERYWHERE except their first occurrence, at the granularity of
  * non-overlapping `n`-word chunks. Suffix arrays find arbitrary-offset
  * repeats but need a global sorted structure; chunking trades offset
  * precision for a plan that is two ordinary shuffles at any corpus size.
  *
  * Plan: one compiled pass splits each doc into chunks (no interpreted
  * higher-order functions), posexplode, then the first-occurrence winner
  * per chunk content is a `min(struct(doc_id, idx))` hash aggregate —
  * partial aggregation collapses repeats map-side, so a viral chunk
  * (appearing millions of times at 100 TB) reduces to one row per map task
  * before the exchange; the winner join back is AQE-skew-splittable.
  * Reconstruction re-aggregates surviving chunks per doc. Chunks travel
  * the shuffles as content strings (bounded: n words), which keeps the
  * operator hash-free and oracle-replayable.
  */
object ChunkDedup {

  /** Per-document result: `n_chunks` (original), `n_kept` (surviving),
    * `clean_text` (surviving chunks re-joined in order; empty string when
    * everything was removed). A chunk survives iff it is the globally
    * FIRST occurrence of its exact content, ordered by (doc_id, position).
    */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // ONE chunking pass: n_chunks rides along the exploded rows
    // (posexplode_outer keeps zero-chunk docs as a null-chunk row, so no
    // second scan and no re-join against the source is needed)
    val chunksArr = TextFunctions.wordChunks(col(textCol), n)
    val exploded = df.select(
      col(idCol),
      size(chunksArr).cast("long").as("n_chunks"),
      posexplode_outer(chunksArr).as(Seq("__idx", "__chunk")))
    val winners = exploded
      .where(col("__chunk").isNotNull)
      .groupBy(col("__chunk"))
      .agg(min(struct(col(idCol), col("__idx"))).as("__w"))
    // null chunks find no winner (left join) -> __keep is null -> dropped
    // by both the count and the collect
    val keep = struct(col(idCol), col("__idx")) === col("__w")
    exploded
      .join(winners, Seq("__chunk"), "left")
      .groupBy(col(idCol))
      .agg(
        max(col("n_chunks")).as("n_chunks"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          sort_array(collect_list(when(keep, struct(col("__idx"), col("__chunk")))))("__chunk"),
          " ").as("clean_text"))
      .select(col(idCol), col("n_chunks"), col("n_kept"), col("clean_text"))
  }
}
