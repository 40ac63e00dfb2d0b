package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.Ranking

/** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
  * score every document with a language-model cross-entropy, then
  * split EACH LANGUAGE into equal head / middle / tail thirds by
  * score — the standard web-corpus quality partition (head = most
  * fluent; downstream mixes sample the tiers differently).
  *
  * Composition of two verified pieces: [[UnigramLm.crossEntropy]] (the
  * q57 score; CCNet proper uses a KenLM 5-gram — the bigram tier L32
  * is the same shape one conditioning level up) and
  * [[Ranking.withGroupedNtile]] (exact per-language NTILE from the
  * scalable global rank — no per-language window task).
  *
  * Bucket assignment is RANK-based, never cut-value-based: comparing
  * raw double scores against a percentile cut is knife-edged across
  * engines (the sums behind xent agree to ~6 digits, not bitwise), so
  * documents are ordered by (round(xent, roundDigits), doc_id) — a
  * total order both engines reproduce exactly — and the tercile is
  * pure integer arithmetic on the rank. The q115 oracle replays it
  * with a plain `ntile(3) OVER (PARTITION BY lang ORDER BY ...)`.
  *
  * Output: (doc_id, lang, n_tokens, xent, bucket 1..k) — one row per
  * document that HAS tokens (token-less docs carry no score, same
  * contract as q57).
  *
  * [[partition]] registers the scored-frame cache with
  * [[graft.etl.CacheTracker]] — long-lived sessions should call
  * `CacheTracker.unpersistCaches()` after materializing the result.
  */
object PerplexityBuckets {

  def partition(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      k: Int = 3,
      unicode: Boolean = false,
      roundDigits: Int = 6): DataFrame = {
    val scored = UnigramLm.crossEntropy(df, idCol, textCol, unicode)
      .withColumn("xent", round(col("xent"), roundDigits))
    // PERSIST the scored frame (one slim row per doc) before ranking:
    // the range-split rank machinery evaluates its input several times
    // (boundary-sample job, per-range counts, group extents, final
    // output) — the right trade for a cheap scan, a 3x wall-clock
    // multiplier on the expensive LM chain (measured 226 s -> the
    // re-measured figure in BENCHNOTES at 5M docs). Tracked in the
    // shared cache queue — callers running many partitions in one
    // session should call graft.etl.CacheTracker.unpersistCaches after
    // materializing (see its scaladoc for the contract).
    val withLang = graft.etl.CacheTracker.persistTracked(scored.join(
      df.select(col(idCol).as("doc_id"), col(langCol).as("lang")), "doc_id"))
    Ranking.withGroupedNtile(withLang, Seq("lang"),
      Seq(col("xent"), col("doc_id")), k, "bucket")
  }
}
