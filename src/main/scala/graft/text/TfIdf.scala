package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus TF-IDF — the classic keyword-salience scoring a training-data
  * pipeline uses for topic tagging, search indexing, and near-dup triage.
  *
  * Plan: tokenize (codegen'd split, no higher-order functions) -> explode
  * -> tf per (doc, term) [shuffle 1, uniform keys] -> document frequency
  * per term [shuffle 2, map-side combined] -> join tf x df on term ->
  * smooth idf `ln((N+1)/(df+1)) + 1` (sklearn's smoothing) -> top-k terms
  * per doc by a doc-partitioned window.
  *
  * Scale notes: the term join is the skew point — stop-words ("the") have
  * millions of tf rows on one key. `maxDfFraction` drops terms appearing
  * in more than that fraction of documents BEFORE the join (the standard
  * max_df cutoff), which removes exactly the hot keys; what remains is
  * zipf-tail uniform enough for a plain hash join. N is one count job —
  * the only corpus-global scalar.
  */
object TfIdf {

  def topTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      maxDfFraction: Double = 0.5,
      unicode: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val n = df.count()
    // unicode = true swaps the [a-z0-9]-run convention for the
    // multilingual tier (TextFunctions.unicodeTokens: codepoint-class
    // runs, CJK singles) — on CJK corpora the ascii tier has NO terms
    val tokens =
      if (unicode) graft.functions.TextFunctions.unicodeTokens(col(textCol))
      else split(lower(col(textCol)), "[^a-z0-9]+")
    val terms = df.select(col(idCol).as("doc_id"),
        explode(tokens).as("term"))
      .where(col("term") =!= "")
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // tf rows are distinct (doc, term), so df = row count per term
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .where(col("df") <= lit(maxDfFraction * n))
    val scored = tf.join(dfreq, "term")
      .withColumn("idf",
        log(lit((n + 1).toDouble) / (col("df") + lit(1)).cast("double")) + lit(1.0))
      .withColumn("tfidf", col("tf") * col("idf"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("tfidf"))
  }
}
