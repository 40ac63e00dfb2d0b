package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.{Pipeline, PipelineStage}
import org.apache.spark.ml.classification.{GBTClassifier, LinearSVC, LogisticRegression, MultilayerPerceptronClassifier, OneVsRest}
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}

import graft.core.DEMV
import graft.data.DatasetSpec
import graft.metrics.{FairnessMetrics, GroupCondition, MetricsResult}

/** One (fold, stop) evaluation record — the row shape of the reference's
  * result CSVs (`ris/...csv` schema `(stat_par, eq_odds, zero_one_loss,
  * disp_imp, acc)`, reference `replication_package/src/utils.py:138-144,
  * 342-354`). Lists never materialize: one row per fold from the start
  * (SURVEY §2.12 E10).
  */
final case class MetricRow(
    fold: Int,
    stop: Long,
    statPar: Double,
    eqOdds: Double,
    zeroOneLoss: Double,
    dispImp: Double,
    acc: Double)

/** K-fold cross-validation harness with fairness metrics and
  * debiaser-in-the-loop training (reference `utils.py:136-158` `cross_val`,
  * `:214-228` `eval_demv`).
  *
  * Scale design: fold assignment is a deterministic hash of the row id —
  * no global sort, no extra shuffle (the reference's `KFold(shuffle=True,
  * random_state=2)` exact-equal split sizes are a single-node artifact;
  * distributionally the hash split is the same contract). `spark.ml`
  * pipelines (VectorAssembler -> StandardScaler -> classifier) mirror the
  * reference's `Pipeline(StandardScaler, clf)` (`generatemetrics.py:196`).
  */
object CrossVal {

  /** E1: add a deterministic fold column in [0, k).
    *
    * Hashing all columns (the default) sends DUPLICATE rows to the same
    * fold — they can never straddle train/test, a mild but deterministic
    * bias vs sklearn's positional KFold (documented deviation; positional
    * splits don't exist in a distributed setting without a total order).
    * Pass `idCols` (a unique row identifier) to spread duplicates
    * independently and to prune the hash input on wide tables.
    */
  def withFolds(df: DataFrame, k: Int, seed: Long = 2L,
      idCols: Option[Seq[String]] = None): DataFrame = {
    val cols = idCols.getOrElse(df.columns.toSeq)
    df.withColumn("__fold",
      pmod(xxhash64(cols.map(col) :+ lit(seed): _*), lit(k)).cast("int"))
  }

  /** spark.ml classifiers require labels in [0, numClasses) — the reference
    * datasets use arbitrary label values (cmc {1,2,3}, wine {4..7}, crime
    * {0,100,...,500}; sklearn accepts them, spark.ml does not). Index the
    * label to a dense 0-based column for training and map predictions back
    * to the ORIGINAL label domain, so fairness metrics and outputs stay in
    * reference terms.
    *
    * @return (df with "__y" indexed label, ascending original label values)
    */
  def labelValues(df: DataFrame, labelCol: String): Seq[Any] =
    // numeric-aware ascending sort = np.unique's ordering (a toString sort
    // would put 10 before 2 for labels like {2, 10})
    df.select(labelCol).distinct().collect().map(_.get(0))
      .sortBy(identity)(graft.core.DEMV.anyOrdering).toSeq

  /** Add "__y" = the 0-based index of `labelCol` within `values` (the
    * mapping must be derived ONCE from the full dataset — a fold can miss
    * classes).
    */
  def indexLabel(df: DataFrame, labelCol: String, values: Seq[Any]): DataFrame = {
    val ladder = values.zipWithIndex.foldLeft(lit(null).cast("double")) {
      case (acc, (v, i)) => when(col(labelCol) === lit(v), i.toDouble).otherwise(acc)
    }
    df.withColumn("__y", ladder)
  }

  /** Map a 0-based prediction column back to the original label domain. */
  def mapPredictionBack(df: DataFrame, values: Seq[Any], predCol: String = "prediction"): DataFrame = {
    val back = values.zipWithIndex.foldLeft(lit(null)) {
      case (acc, (v, i)) => when(col(predCol) === i.toDouble, lit(v)).otherwise(acc)
    }
    df.withColumn(predCol, back)
  }

  /** E3/E4: the reference's classifier matrix (`generatemetrics.py:173-196`).
    * GBT and SVC are binary-only in spark.ml -> OneVsRest wrap when the
    * label has more than two classes (SURVEY E4).
    */
  def pipeline(
      classifier: String,
      featureCols: Seq[String],
      labelCol: String,
      numClasses: Int): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__features_raw")
      .setHandleInvalid("skip")
    val scaler = new StandardScaler()
      .setInputCol("__features_raw").setOutputCol("__features")
      .setWithMean(true).setWithStd(true)
    val clf: PipelineStage = classifier match {
      case "logistic" =>
        new LogisticRegression().setLabelCol(labelCol).setFeaturesCol("__features")
      case "gradient" =>
        val gbt = new GBTClassifier().setLabelCol(labelCol).setFeaturesCol("__features")
        if (numClasses > 2) new OneVsRest().setClassifier(gbt)
          .setLabelCol(labelCol).setFeaturesCol("__features")
        else gbt
      case "svc" =>
        val svc = new LinearSVC().setLabelCol(labelCol).setFeaturesCol("__features")
        if (numClasses > 2) new OneVsRest().setClassifier(svc)
          .setLabelCol(labelCol).setFeaturesCol("__features")
        else svc
      case "mlp" =>
        // layer sizes filled at fit time by the caller via numClasses and
        // feature count; sklearn default hidden size is 100
        new MultilayerPerceptronClassifier()
          .setLabelCol(labelCol).setFeaturesCol("__features")
          .setLayers(Array(featureCols.length, 100, numClasses))
      case other => throw new IllegalArgumentException(s"Unknown classifier '$other'")
    }
    new Pipeline().setStages(Array(assembler, scaler, clf))
  }

  /** E2 + E5 + E9: k-fold CV; `method` = "biased" (train as-is) or "demv"
    * (balance the train folds first). Returns one MetricRow per fold.
    *
    * The reference re-runs DEMV `repetitions` times per fold to average its
    * stochasticity (`utils.py:231-239`); we re-seed per repetition.
    */
  def crossVal(
      spec: DatasetSpec,
      classifier: String,
      method: String = "biased",
      k: Int = 10,
      stop: Long = 10000L,
      repetitions: Int = 1,
      seed: Long = 2L): Seq[MetricRow] = {
    val labelCol = spec.label
    val featureCols = spec.df.columns.filterNot(_ == labelCol).toSeq
    val allLabels = labelValues(spec.df, labelCol)
    val numClasses = allLabels.length
    val folded = withFolds(spec.df, k, seed).cache()
    try {
      (0 until k).flatMap { fold =>
        val test = folded.where(col("__fold") === fold).drop("__fold")
        val trainBase = folded.where(col("__fold") =!= fold).drop("__fold")
        (0 until repetitions).map { rep =>
          // "eg"/"grid" are in-processing reductions (reference
          // `generatemetrics.py:101-131`): the fair model IS the method, so
          // they bypass the plain classifier pipeline. Both train a
          // logistic learner internally (matching BASELINE.md's eg/grid
          // rows); `classifier` is ignored for them.
          val pred = method match {
            case "eg" =>
              val ens = Reductions.ExponentiatedGradient.fitEnsemble(
                indexLabel(trainBase, labelCol, allLabels), featureCols, "__y",
                spec.sensitiveVars, bound = 0.1, seed = seed + fold * 31 + rep)
              mapPredictionBack(ens.transform(indexLabel(test, labelCol, allLabels)), allLabels)
            case "grid" =>
              val fitted = Reductions.GridSearch.fit(
                indexLabel(trainBase, labelCol, allLabels), featureCols, "__y",
                spec.sensitiveVars, spec.unprivGroup, bound = 0.1)
              mapPredictionBack(fitted.transform(indexLabel(test, labelCol, allLabels)), allLabels)
            case _ =>
              val balanced = method match {
                case "biased" => trainBase
                case "demv" | "random" =>
                  new DEMV(spec.sensitiveVars, stop = stop, seed = seed + fold * 31 + rep,
                    shuffleOutput = false).fitTransform(trainBase, labelCol)
                case "uniform" | "smote" | "adasyn" =>
                  new DEMV(spec.sensitiveVars, stop = stop, seed = seed + fold * 31 + rep,
                    shuffleOutput = false, strategy = method).fitTransform(trainBase, labelCol)
                case other => throw new IllegalArgumentException(s"Unknown method '$other'")
              }
              // balancer output is a per-cell union plan; on wide datasets
              // (adult: ~100 one-hot columns x 8 cells) Catalyst re-analysis
              // of that tree per ml action dominates wall time (measured:
              // minutes of pure driver plan-transform CPU). The fit
              // materializes the frame anyway — truncate the lineage first.
              val train = if (method == "biased") balanced else balanced.localCheckpoint()
              val model = pipeline(classifier, featureCols, "__y", numClasses)
                .fit(indexLabel(train, labelCol, allLabels))
              mapPredictionBack(
                model.transform(indexLabel(test, labelCol, allLabels)), allLabels)
          }
          val m = FairnessMetrics.compute(
            pred, spec.sensitiveVars, GroupCondition(spec.unprivGroup),
            "prediction", labelCol, spec.positiveLabel)
          MetricRow(fold, stop, m.statisticalParity, m.equalizedOdds,
            m.zeroOneLossDiff, m.disparateImpact, m.accuracy)
        }
      }
    } finally folded.unpersist()
  }

  /** E6: convergence sweep — run `crossVal(method="demv")` for
    * stop = 0, k, 2k, ... up to the dataset's max iterations (reference
    * `eval_demv`, `utils.py:214-228`; per-dataset step table SURVEY §6).
    */
  def evalDemv(
      spec: DatasetSpec,
      classifier: String,
      maxIters: Long,
      step: Int,
      k: Int = 10,
      repetitions: Int = 1,
      seed: Long = 2L): Seq[MetricRow] =
    (0L to maxIters by step.toLong).flatMap { stop =>
      crossVal(spec, classifier, method = "demv", k = k, stop = stop,
        repetitions = repetitions, seed = seed)
    }

  /** S7: result sink with the reference's file-naming contract
    * `ris/{n}features/metrics_{dataset}_{method}_{n}_features_{classifier}.csv`
    * (reference `generatemetrics.py:251-262`, `replication_package/
    * README.md:107`).
    */
  def writeMetrics(
      spark: SparkSession,
      rows: Seq[MetricRow],
      outDir: String,
      dataset: String,
      method: String,
      nFeatures: Int,
      classifier: String): String = {
    import spark.implicits._
    val path = s"$outDir/${nFeatures}features/metrics_${dataset}_${method}_${nFeatures}_features_$classifier.csv"
    rows.toDF()
      .selectExpr("statPar as stat_par", "eqOdds as eq_odds",
        "zeroOneLoss as zero_one_loss", "dispImp as disp_imp", "acc")
      .coalesce(1).write.mode("overwrite").option("header", true).csv(path)
    path
  }
}
