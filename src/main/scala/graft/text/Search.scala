package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Keyword search over a document corpus — the retrieval primitive of a
  * data-curation UI ("show me every doc mentioning X and Y") and the
  * batch shape of an inverted index.
  *
  * Plan: tokenize -> explode -> FILTER TO THE QUERY TERMS before any
  * shuffle (an `isin` over a handful of literals — the posting stream
  * that reaches the exchange is |terms| postings, not the corpus) ->
  * distinct (doc, term) -> AND = docs whose distinct matched-term count
  * equals |terms|. Scoring: total term frequency, descending — crude
  * but monotone with relevance for AND queries.
  *
  * At 100 TB the posting-list explode is the whole cost and it prunes at
  * the scan: only `textCol` and `idCol` are read, and the isin filter is
  * codegen'd per token. No index build is needed for one-shot queries;
  * for repeated querying, materialize `postings` (the commented shape
  * below) bucketed by term.
  */
object Search {

  /** Fail-loud term validation shared by the retrieval entry points: a
    * term the tokenizer could never emit (uppercase, punctuation, a
    * multi-token phrase) matches nothing and would silently break AND
    * gates / contribute zero to OR scores. ASCII tier: `[a-z0-9]+`.
    * Unicode tier: the term must tokenize to exactly itself (one token
    * of the SAME compiled kernel the corpus side uses).
    */
  private[text] def requireValidTerms(terms: Seq[String], unicode: Boolean): Unit =
    if (unicode)
      require(terms.forall(t => graft.functions.TextAlgo.unicodeTokenize(t) == Seq(t)),
        s"terms must each be a single unicode-tier token, got $terms")
    else
      require(terms.forall(_.matches("[a-z0-9]+")),
        s"terms must be non-empty lowercase alnum tokens, got $terms")

  /** Documents containing ALL `terms` (case-insensitive, word-boundary
    * tokens): (doc_id, n_hits = total tf over the query terms), best
    * first. `terms` must be lowercase single tokens.
    */
  def matchAll(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      unicode: Boolean = false): DataFrame = {
    require(terms.nonEmpty, "at least one search term required")
    // same contract as bm25TopK: a term the tokenizer could never produce
    // would make the AND gate silently unmatchable — fail loud instead
    Search.requireValidTerms(terms, unicode)
    // the AND gate counts DISTINCT matched terms, so compare against the
    // distinct term count — a caller-assembled list with a repeated term
    // could otherwise never satisfy the gate and silently match nothing
    val uniqueTerms = terms.distinct
    val tokens =
      if (unicode) TextFunctions.unicodeTokens(col(textCol))
      else split(lower(col(textCol)), "[^a-z0-9]+")
    val postings = df.select(col(idCol).as("doc_id"),
        explode(tokens).as("term"))
      .where(col("term").isin(uniqueTerms: _*))
    postings
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("n_terms"), count(lit(1)).as("n_hits"))
      .where(col("n_terms") === uniqueTerms.length)
      .select(col("doc_id"), col("n_hits"))
  }

  /** BM25-scored top-k retrieval (OR semantics, Robertson/Lucene idf
    * `ln(1 + (N-df+0.5)/(df+0.5))` — always positive, so a matched term
    * never subtracts). Output: (doc_id, n_terms, bm25) for the `k`
    * best-scoring documents, ordered by (rounded score desc, doc_id).
    *
    * Plan — ONE corpus shuffle total:
    *  - tokenize with the compiled [[TextFunctions.asciiTokens]] kernel
    *    (identical semantics to `split(lower(text), "[^a-z0-9]+")`); the
    *    document length `dl` is `size` of the SAME materialized array, so
    *    length costs no second pass and — because dl is functionally
    *    dependent on doc_id — RIDES THE GROUPING KEY instead of needing a
    *    corpus-wide doc-length join after the posting aggregation.
    *  - postings are filtered to the |Q| query terms BEFORE the exchange
    *    (codegen'd isin on the generator output), so the shuffle carries
    *    |matching postings|, not the corpus token stream.
    *  - df-per-term is |Q| rows: broadcast back onto tf.
    *  - N and avgdl are one map-side agg job (the only corpus-global
    *    scalars); avgdl = sum(dl)/N over ALL docs including token-less
    *    ones, embedded as a plan literal.
    *  - global top-k = orderBy+limit = TakeOrderedAndProject: map-side
    *    partial top-k per partition, k rows to the driver — no full sort.
    *
    * Ordering ties break on the ROUNDED (6-dp) score then doc_id so the
    * cut is reproducible cross-engine.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      unicode: Boolean = false): DataFrame = {
    require(terms.nonEmpty, "at least one search term required")
    // a term the tokenizer could never produce would silently contribute
    // nothing to the OR; fail loud instead
    Search.requireValidTerms(terms, unicode)
    require(k > 0, s"k must be positive, got $k")
    val tokensOf = (c: org.apache.spark.sql.Column) =>
      if (unicode) TextFunctions.unicodeTokens(c) else TextFunctions.asciiTokens(c)
    val uniqueTerms = terms.distinct
    val stats = df.agg(
      count(lit(1)).as("n"),
      sum(size(tokensOf(col(textCol))).cast("long")).as("sum_dl")).first()
    val n = stats.getLong(0)
    require(n > 0, "bm25TopK needs a non-empty corpus")
    // sum is NULL when every document's text is NULL — score stream is
    // empty then anyway, but the scalar fetch must not throw
    val avgdl = (if (stats.isNullAt(1)) 0L else stats.getLong(1)).toDouble / n
    val toks = df.select(col(idCol).as("doc_id"),
      tokensOf(col(textCol)).as("toks"))
    val tf = toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .where(col("term").isin(uniqueTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))
    tf.join(broadcast(dfreq), "term")
      .withColumn("contrib", idf * col("tf") * lit(k1 + 1.0) / denom)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        round(sum(col("contrib")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** BATCH BM25: score THOUSANDS of queries against the corpus in one
    * plan — the retrieval-pipeline shape (eval suites, hard-negative
    * mining, RAG batch scoring) where running [[bm25TopK]] per query
    * would re-scan the corpus |Q| times.
    *
    * `queries` is a small (query_id, term) table — one row per query
    * term, duplicates ignored. Same arithmetic, idf and rounding as
    * [[bm25TopK]] (the q77 oracle generalizes directly; q92 checks it).
    *
    * Plan — corpus cost is INDEPENDENT of the query count (one stats
    * job + the postings scan for tf, plus the per-term df branch over
    * the same filtered aggregation — AQE's runtime stage reuse can
    * collapse the twin; either way it is O(corpus), never O(corpus x
    * |Q|) like a per-query loop):
    *  - postings are filtered by a BROADCAST semi-join against the
    *    distinct term set of ALL queries (replacing the single-query
    *    isin) before the exchange;
    *  - per-(doc, term) tf and per-term df aggregate exactly as in the
    *    single-query path — both are query-independent;
    *  - the broadcast (query_id, term) table fans each scored posting
    *    out to the queries containing its term (map-side, no shuffle);
    *  - per-query top-k = row_number over (query_id) ranked by
    *    (rounded score DESC, doc_id), filtered to <= k — Spark plans
    *    the rank filter as a map-side WindowGroupLimit, so each
    *    partition forwards at most k rows per query to the final sort.
    *
    * Output: (query_id, doc_id, n_terms, bm25, rank), rank 1..k per
    * query; queries whose terms match nothing yield no rows (OR
    * semantics, like the single-query path).
    */
  def bm25TopKBatch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      termCol: String,
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      unicode: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tokensOf = (c: org.apache.spark.sql.Column) =>
      if (unicode) TextFunctions.unicodeTokens(c) else TextFunctions.asciiTokens(c)
    val q = queries
      .select(col(queryIdCol).as("query_id"), col(termCol).as("term"))
      .distinct()
    // same fail-loud contract as bm25TopK: a term the tokenizer could
    // never produce would silently contribute nothing. The queries table
    // is broadcast-small by contract, so the validation peek costs one
    // tiny job. Unicode mode: valid = the term tokenizes to exactly
    // itself (one token), expressed over the same compiled kernel.
    val valid =
      if (unicode)
        size(TextFunctions.unicodeTokens(col("term"))) === 1 &&
          element_at(TextFunctions.unicodeTokens(col("term")), 1) === col("term")
      else col("term").rlike("^[a-z0-9]+$")
    val bad = q.where(!coalesce(valid, lit(false))).limit(5).collect()
    require(bad.isEmpty,
      s"query terms must be single tokenizer-producible tokens, got e.g. ${bad.mkString(", ")}")
    val stats = df.agg(
      count(lit(1)).as("n"),
      sum(size(tokensOf(col(textCol))).cast("long")).as("sum_dl")).first()
    val n = stats.getLong(0)
    require(n > 0, "bm25TopKBatch needs a non-empty corpus")
    val avgdl = (if (stats.isNullAt(1)) 0L else stats.getLong(1)).toDouble / n
    val terms = q.select(col("term")).distinct()
    val tf = df.select(col(idCol).as("doc_id"),
        tokensOf(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .join(broadcast(terms), "term")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("bm25").desc, col("doc_id"))
    tf.join(broadcast(dfreq), "term")
      .withColumn("contrib", idf * col("tf") * lit(k1 + 1.0) / denom)
      .join(broadcast(q), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        round(sum(col("contrib")), 6).as("bm25"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Positional phrase search (SURVEY+ L71): documents containing each
    * phrase as an EXACT consecutive token sequence, with occurrence
    * counts — the retrieval tier AND-of-terms cannot express ("new york
    * times" vs documents merely containing all three words).
    *
    * Output: (query_id, phrase, doc_id, n_occ) for every document with
    * at least one occurrence.
    *
    * Plan — the inverted-index-with-positions shape, ONE corpus scan,
    * two shuffles of query-term postings only:
    *  - tokenize once (compiled [[TextFunctions.asciiTokens]] kernel or
    *    the unicode tier), posexplode to (doc, term, pos), and FILTER to
    *    the union of all phrase terms before any exchange — the posting
    *    stream that shuffles is |phrase terms| postings, not the corpus;
    *  - aggregate to per-(doc, term) sorted position arrays (map-side
    *    combine applies);
    *  - broadcast-join the (query_id, term, offset) slot table: each
    *    posting row fans out to the phrase slots using its term,
    *    shifting positions by the slot offset (`transform`, map-side);
    *  - group by (query, doc): the phrase matches where ALL slots are
    *    present (row count == slot count) and the shifted position
    *    arrays intersect; n_occ = |intersection| (a fold of
    *    `array_intersect` — occurrence starts where every slot aligns).
    *
    * A phrase with a REPEATED term contributes one slot row per offset
    * joined from the same posting row, so repeats ("table table") align
    * correctly. Per-(doc,term) position arrays are bounded by document
    * length; no all-pairs or cartesian anywhere.
    */
  def phraseMatches(
      df: DataFrame,
      idCol: String,
      textCol: String,
      phrases: Seq[String],
      unicode: Boolean = false): DataFrame = {
    require(phrases.nonEmpty, "at least one phrase required")
    val spark = df.sparkSession
    import spark.implicits._
    val parsed: Seq[(Long, String, Seq[String])] =
      phrases.zipWithIndex.map { case (p, qi) =>
        val terms: Seq[String] =
          if (unicode) graft.functions.TextAlgo.unicodeTokenize(p).toSeq
          else p.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
        require(terms.nonEmpty, s"phrase tokenizes to nothing: '$p'")
        requireValidTerms(terms, unicode)
        (qi.toLong, p, terms)
      }
    val slots = parsed.flatMap { case (qi, p, ts) =>
      ts.zipWithIndex.map { case (t, off) => (qi, p, ts.length, t, off) }
    }
    val slotDf = slots.toDF("query_id", "phrase", "n_slots", "term", "offset")
    val allTerms = slots.map(_._4).distinct
    val tokens =
      if (unicode) TextFunctions.unicodeTokens(col(textCol))
      else TextFunctions.asciiTokens(col(textCol))
    val postings = df.select(col(idCol).as("doc_id"), posexplode(tokens))
      .toDF("doc_id", "pos", "term")
      .where(col("term").isin(allTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
    postings.join(broadcast(slotDf), Seq("term"))
      .select(col("query_id"), col("phrase"), col("n_slots"), col("doc_id"),
        transform(col("positions"), pp => pp - col("offset")).as("shifted"))
      .groupBy(col("query_id"), col("phrase"), col("n_slots"), col("doc_id"))
      .agg(count(lit(1)).as("n_present"), collect_list(col("shifted")).as("arrs"))
      .where(col("n_present") === col("n_slots"))
      .select(col("query_id"), col("phrase"), col("doc_id"),
        size(aggregate(col("arrs"), element_at(col("arrs"), 1),
          (acc, a) => array_intersect(acc, a))).as("n_occ"))
      .where(col("n_occ") > 0)
  }
}
