package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination — flag training documents that share word
  * n-grams with an evaluation/benchmark set, the standard pre-training
  * hygiene step (GPT-3 App. C / PaLM / Llama all ship a variant: a doc is
  * contaminated when any of its n-grams appears verbatim in a benchmark).
  *
  * Plan shape for 100 TB: the benchmark side is TINY relative to the
  * corpus (benchmarks are at most millions of n-grams), so its distinct
  * n-gram set aggregates to a small relation that BROADCASTS — the corpus
  * explode-and-match runs entirely map-side against the broadcast hash
  * relation, no corpus shuffle at all. The only exchange is the per-doc
  * hit-count aggregation, which ships (doc_id, count) pairs — partial
  * aggregation collapses them before the wire. Raw text never shuffles.
  *
  * N-grams are exact strings (not hashes): equality must be
  * engine-portable for the oracle and hash-free for auditability; the
  * broadcast side is small enough that hashing would save nothing.
  */
object Decontaminate {

  /** Per-document contamination report against `bench`: documents from
    * `train` sharing at least one distinct word-`n`-gram with any
    * benchmark document, with `n_hits` (distinct shared n-grams),
    * `n_ngrams` (the doc's distinct n-gram count) and the contamination
    * fraction. Clean documents are absent; `ngramCol` semantics follow
    * [[TextFunctions.wordNgrams]] (whitespace tokens, exact strings).
    */
  def overlapReport(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      unicode: Boolean = false): DataFrame = {
    val benchGrams = bench
      .select(explode(TextFunctions.wordNgrams(col(textCol), n, unicode)).as("__g"))
      .distinct()
      .withColumn("__hit", lit(1))
    // ONE tokenization pass: the exploded distinct n-grams left-join the
    // broadcast bench set with a hit marker, then n_ngrams (count of
    // exploded grams — wordNgrams is already distinct) and n_hits fall out
    // of the same per-doc aggregate. Docs in the report always have
    // n_ngrams >= 1 by construction (a hit requires an n-gram).
    train
      .select(col(idCol), explode(TextFunctions.wordNgrams(col(textCol), n, unicode)).as("__g"))
      .join(broadcast(benchGrams), Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"), count(col("__hit")).as("n_hits"))
      .where(col("n_hits") > 0)
      .withColumn("frac",
        round(col("n_hits").cast("double") / col("n_ngrams").cast("double"), 6))
  }

  /** The corpus with contaminated documents REMOVED — `overlapReport`'s
    * flagged ids anti-joined out. The report side carries only ids, so
    * the anti-join ships ids; with a bounded benchmark the flagged set is
    * bounded too and Spark's AQE converts this to a broadcast anti-join.
    */
  def removeContaminated(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      unicode: Boolean = false): DataFrame = {
    val flagged = overlapReport(train, bench, idCol, textCol, n, unicode).select(col(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }
}
