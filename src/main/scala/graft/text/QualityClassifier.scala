package graft.text

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document-quality filter — the model-based step beyond
  * [[graft.functions.TextFunctions.qualityScore]]'s fixed heuristics: a
  * logistic regression over hashed token counts, the GPT-3/CCNet recipe
  * (train positives = a curated reference corpus, negatives = raw crawl;
  * keep documents the model scores reference-like).
  *
  * Scale shape: tokenization + feature hashing are stateless map-side
  * transforms (no vocabulary build, no shuffle — the hashing trick is what
  * makes this viable at 100 TB where a fitted vocabulary would itself be a
  * giant artifact); LR training is a handful of full scans via
  * tree-aggregated gradients; scoring is one map-side pass. The feature
  * space is `numFeatures` buckets (default 2^18) — collisions degrade
  * gracefully, exactly as in fastText.
  */
object QualityClassifier {

  /** Fit on `labelCol` (0.0 = negative/crawl, 1.0 = positive/reference). */
  def train(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      numFeatures: Int = 1 << 18,
      regParam: Double = 1e-4,
      maxIter: Int = 50): PipelineModel = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__graft_tokens")
      .setPattern("\\s+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("__graft_tokens").setOutputCol("__graft_features")
      .setNumFeatures(numFeatures)
    val lr = new LogisticRegression()
      .setFeaturesCol("__graft_features").setLabelCol(labelCol)
      .setRegParam(regParam).setMaxIter(maxIter)
      .setProbabilityCol("__graft_prob")
    new Pipeline().setStages(Array(tok, tf, lr)).fit(df)
  }

  /** `df` plus `qualityProbCol` = P(reference-like) in [0, 1]. */
  def score(
      model: PipelineModel,
      df: DataFrame,
      qualityProbCol: String = "quality_prob"): DataFrame =
    model.transform(df)
      .withColumn(qualityProbCol, vector_to_array(col("__graft_prob")).getItem(1))
      .drop("__graft_tokens", "__graft_features", "__graft_prob",
        "rawPrediction", "prediction")

  /** Keep rows scoring at least `threshold` — the filter form. */
  def filterByQuality(
      model: PipelineModel,
      df: DataFrame,
      threshold: Double): DataFrame = {
    val out = df.columns.map(col)
    score(model, df, "__graft_q")
      .where(col("__graft_q") >= threshold)
      .select(out: _*)
  }
}
