package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Documents containing ALL `terms` (case-insensitive, word-boundary
    * tokens): (doc_id, n_hits = total tf over the query terms), best
    * first. `terms` must be lowercase single tokens.
    */
  def matchAll(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "at least one search term required")
    require(terms.forall(t => t.nonEmpty && t == t.toLowerCase),
      "terms must be non-empty lowercase tokens")
    // the AND gate counts DISTINCT matched terms, so compare against the
    // distinct term count — a caller-assembled list with a repeated term
    // could otherwise never satisfy the gate and silently match nothing
    val uniqueTerms = terms.distinct
    val postings = df.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .where(col("term").isin(uniqueTerms: _*))
    postings
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("n_terms"), count(lit(1)).as("n_hits"))
      .where(col("n_terms") === uniqueTerms.length)
      .select(col("doc_id"), col("n_hits"))
  }
}
