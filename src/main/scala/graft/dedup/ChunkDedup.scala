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
    val chunks = df.select(
        col(idCol),
        posexplode(TextFunctions.wordChunks(col(textCol), n)).as(Seq("__idx", "__chunk")))
    val winners = chunks
      .groupBy(col("__chunk"))
      .agg(min(struct(col(idCol), col("__idx"))).as("__w"))
    val kept = chunks
      .join(winners, Seq("__chunk"))
      .where(struct(col(idCol), col("__idx")) === col("__w"))
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          sort_array(collect_list(struct(col("__idx"), col("__chunk"))))("__chunk"),
          " ").as("clean_text"))
    df.select(col(idCol),
        size(TextFunctions.wordChunks(col(textCol), n)).cast("long").as("n_chunks"))
      .join(rebuilt, Seq(idCol), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
  }
}
