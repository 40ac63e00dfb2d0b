package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.DEMV
import graft.data.DatasetSpec
import graft.metrics.GroupCondition

/** The reference's third entry point (SURVEY §3.3, E9/S8): out-of-fold
  * prediction assembly + per-group confusion matrices (reference
  * `confusionmatrix.py:147-229`). The reference renders PDFs; the engine
  * emits the normalized counts table — plotting is a driver-side concern
  * (SURVEY S8: out of engine scope).
  */
object ConfusionMatrices {

  /** E9: union of per-fold test predictions — every row predicted exactly
    * once by a model that never saw it (reference `getprediction`,
    * `confusionmatrix.py:186-205`; optional whole-dataset DEMV first,
    * `:160-165`).
    */
  def outOfFoldPredictions(
      spec: DatasetSpec,
      classifier: String,
      debiaser: Option[String] = None,
      k: Int = 10,
      seed: Long = 2L): DataFrame = {
    val base = debiaser match {
      case Some("demv") =>
        new DEMV(spec.sensitiveVars, seed = seed, shuffleOutput = false)
          .fitTransform(spec.df, spec.label)
      case _ => spec.df
    }
    val featureCols = base.columns.filterNot(_ == spec.label).toSeq
    val allLabels = CrossVal.labelValues(base, spec.label)
    val folded = CrossVal.withFolds(
      CrossVal.indexLabel(base, spec.label, allLabels), k, seed).cache()
    try {
      (0 until k).map { fold =>
        val model = CrossVal.pipeline(classifier, featureCols, "__y", allLabels.length)
          .fit(folded.where(col("__fold") =!= fold))
        CrossVal.mapPredictionBack(
          model.transform(folded.where(col("__fold") === fold)), allLabels)
          .select((featureCols.map(col) :+ col(spec.label).as("y_true") :+ col("prediction")): _*)
      }.reduce(_ unionByName _)
    } finally folded.unpersist()
  }

  /** Per-group normalized confusion matrix: for the unprivileged group and
    * its complement separately, counts and row-normalized rates per
    * (y_true, prediction) — the numbers behind the reference's PDF heatmaps
    * (`confusionmatrix.py:100-144,227-229`). One aggregation pass.
    */
  def perGroup(
      predDF: DataFrame,
      unpriv: GroupCondition,
      trueCol: String = "y_true",
      predCol: String = "prediction"): DataFrame = {
    val tagged = predDF.withColumn("group",
      when(unpriv.column, "unprivileged").otherwise("privileged"))
    val counts = tagged.groupBy(col("group"), col(trueCol).as("y_true"), col(predCol).as("y_pred"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("group"), col("y_true"))
      .agg(sum(col("n")).as("row_total"))
    counts.join(totals, Seq("group", "y_true"))
      .withColumn("rate", round(col("n") / col("row_total"), 6))
      .select(col("group"), col("y_true"), col("y_pred"), col("n"), col("rate"))
  }
}
