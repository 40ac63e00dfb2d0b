package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the CCNet-style quality signal: score
  * each document by its per-token cross-entropy under the corpus's own
  * add-one-smoothed unigram distribution. Boilerplate/templated text
  * scores low (tokens the corpus sees constantly), lorem-ipsum noise
  * scores high; cleaning pipelines threshold both tails.
  *
  * Plan: (doc, term) tf first [shuffle on the UNIFORM (doc, term) key] ->
  * per-term corpus counts from tf [map-side combined] -> join tf x probs
  * on term -> weighted per-doc average. Joining tf (not raw tokens)
  * against the prob table cuts the hot-term rows by the average tf
  * factor; the prob side is one row per term, so AQE turns the join into
  * a broadcast when the vocabulary fits. Corpus totals (T tokens, V
  * vocab) are the only driver scalars.
  */
object UnigramLm {

  /** (doc_id, n_tokens, xent): per-token cross-entropy
    * `sum(tf * -ln((c+1)/(T+V))) / sum(tf)`, natural log.
    */
  def crossEntropy(df: DataFrame, idCol: String, textCol: String,
      unicode: Boolean = false): DataFrame = {
    // unicode tier: multilingual tokens (CJK singles) instead of
    // [a-z0-9] runs — a CJK corpus otherwise has zero tokens
    val tokens =
      if (unicode) graft.functions.TextFunctions.unicodeTokens(col(textCol))
      else split(lower(col(textCol)), "[^a-z0-9]+")
    val toks = df.select(col(idCol).as("doc_id"),
        explode(tokens).as("term"))
      .where(col("term") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val termCounts = tf.groupBy(col("term")).agg(sum(col("tf")).as("c"))
    // sum over an EMPTY tf stream is NULL (a token-less corpus — e.g. an
    // all-CJK corpus under the ascii tier); the scalar fetch must not
    // throw, and t=0 flows to an empty (not wrong) result
    val tRow = tf.agg(sum(col("tf"))).collect()(0)
    val t = if (tRow.isNullAt(0)) 0L else tRow.getLong(0)
    val v = termCounts.count()
    val probs = termCounts.withColumn("prob",
      (col("c") + lit(1)).cast("double") / lit((t + v).toDouble))
    tf.join(probs.select(col("term"), col("prob")), "term")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        (sum(col("tf") * -log(col("prob"))) / sum(col("tf"))).as("xent"))
  }

  /** (doc_id, n_bigrams, xent): per-bigram cross-entropy under the
    * corpus's add-one-smoothed BIGRAM model,
    * `P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)` — one conditioning level
    * beyond [[crossEntropy]], the shape CCNet's KenLM filter takes at
    * n=5. Repetitive/templated text collapses toward its own transitions
    * and scores near zero; shuffled-word noise scores near ln(V).
    *
    * Plan: a COMPILED map-side bigram kernel
    * ([[graft.functions.WordBigramsExpr]] — the first cut shuffled the
    * whole token stream through a per-doc lead window just to pair
    * neighbors) -> bigram tf [shuffle on the uniform (doc, bigram) key] ->
    * corpus bigram counts -> prefix counts aggregated FROM the bigram
    * counts (one row per distinct bigram, not per occurrence) -> probs
    * join back. V (the unigram vocabulary) and nothing else reaches the
    * driver.
    */
  def bigramCrossEntropy(df: DataFrame, idCol: String, textCol: String,
      unicode: Boolean = false): DataFrame = {
    val bigrams = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.wordBigrams(col(textCol), unicode)).as("bg"))
    val tf2 = bigrams.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("tf"))
    val c2 = tf2.groupBy(col("bg")).agg(sum(col("tf")).as("c2"))
    val c1 = c2.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    // vocabulary from the SAME compiled tokenizer as the bigram stream —
    // a lower()+regex V here could disagree with the kernel on characters
    // whose Unicode lowercase is ASCII alnum (e.g. the Kelvin sign)
    val v = df.select(
        explode(
          if (unicode) graft.functions.TextFunctions.unicodeTokens(col(textCol))
          else graft.functions.TextFunctions.asciiTokens(col(textCol))).as("term"))
      .distinct().count()
    val probs = c2.withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(c1, "w1")
      .select(col("bg"),
        ((col("c2") + lit(1)).cast("double") / (col("c1") + lit(v)).cast("double")).as("prob"))
    tf2.join(probs, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        (sum(col("tf") * -log(col("prob"))) / sum(col("tf"))).as("xent"))
  }

  /** (doc_id, n_trigrams, xent): per-trigram cross-entropy under the
    * corpus's add-one-smoothed TRIGRAM model,
    * `P(w3|w1 w2) = (c(w1 w2 w3) + 1) / (c(w1 w2 ·) + V)` — one
    * conditioning level beyond [[bigramCrossEntropy]], a step closer to
    * the 5-gram KenLM the CCNet recipe scores with (Wenzek et al. 2020)
    * while keeping the exact-integer-counts + replayable-double
    * discipline of the lower orders.
    *
    * Plan shape is the bigram tier's with n = 3: compiled map-side
    * n-gram kernel ([[graft.functions.WordNgramStreamExpr]]) -> trigram tf
    * [shuffle on the uniform (doc, trigram) key] -> corpus trigram
    * counts -> PREFIX counts aggregated from the trigram counts (one
    * row per distinct trigram — `c(w1 w2 ·) = sum over w3`, never a
    * second corpus pass) -> probs join back. Only V reaches the driver.
    */
  def trigramCrossEntropy(df: DataFrame, idCol: String, textCol: String,
      unicode: Boolean = false): DataFrame = {
    val trigrams = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.wordNgramStream(col(textCol), 3, unicode)).as("tg"))
    val tf3 = trigrams.groupBy(col("doc_id"), col("tg")).agg(count(lit(1)).as("tf"))
    val c3 = tf3.groupBy(col("tg")).agg(sum(col("tf")).as("c3"))
    // tokens never contain spaces, so the first two space-joined labels
    // ARE the conditioning prefix
    val cp = c3.groupBy(substring_index(col("tg"), " ", 2).as("w12"))
      .agg(sum(col("c3")).as("cp"))
    // vocabulary from the SAME compiled tokenizer family as the n-gram
    // stream (see bigramCrossEntropy for why a lower()+regex V here
    // could disagree)
    val v = df.select(
        explode(
          if (unicode) graft.functions.TextFunctions.unicodeTokens(col(textCol))
          else graft.functions.TextFunctions.asciiTokens(col(textCol))).as("term"))
      .distinct().count()
    val probs = c3.withColumn("w12", substring_index(col("tg"), " ", 2))
      .join(cp, "w12")
      .select(col("tg"),
        ((col("c3") + lit(1)).cast("double") / (col("cp") + lit(v)).cast("double")).as("prob"))
    tf3.join(probs, Seq("tg"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_trigrams"),
        (sum(col("tf") * -log(col("prob"))) / sum(col("tf"))).as("xent"))
  }
}
