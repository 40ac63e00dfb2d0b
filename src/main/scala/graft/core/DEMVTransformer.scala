package graft.core

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{IntParam, LongParam, Param, ParamMap, StringArrayParam}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.StructType

/** `spark.ml` Pipeline-compatible wrapper around [[DEMV]] — lets the
  * debiaser sit as a stage before VectorAssembler/classifier stages
  * (the reference exposes a sklearn-style transformer, `demv/demv.py:22`;
  * this is the spark.ml equivalent of that API shape).
  *
  * Balancing is stateless across calls (the reference's `fit` and
  * `transform` are both aliases of `fit_transform`, `demv/demv.py:59,77`),
  * so this is a `Transformer`, not an `Estimator`: each `transform` call
  * re-balances its input. Consequently it belongs in PRE-PROCESSING
  * pipelines (train-side), not inference pipelines — a PipelineModel
  * containing it would re-balance test data too. Last-run diagnostics via
  * [[getIters]]/[[getDisparities]].
  */
class DEMVTransformer(override val uid: String) extends Transformer {

  def this() = this(Identifiable.randomUID("demv"))

  final val sensitiveVars = new StringArrayParam(this, "sensitiveVars", "binary 0/1 sensitive columns")
  final val labelCol = new Param[String](this, "labelCol", "label column")
  final val roundLevel = new IntParam(this, "roundLevel", "disparity rounding digits; <=0 disables")
  final val stop = new LongParam(this, "stop", "max balance iterations per cell")
  final val seed = new LongParam(this, "seed", "sampling/shuffle seed")
  final val strategy = new Param[String](this, "strategy", "random|uniform|smote|adasyn")

  setDefault(roundLevel -> 1, stop -> 10000L, seed -> 2L, strategy -> "random", labelCol -> "label")

  def setSensitiveVars(v: Array[String]): this.type = set(sensitiveVars, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setRoundLevel(v: Int): this.type = set(roundLevel, v)
  def setStop(v: Long): this.type = set(stop, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setStrategy(v: String): this.type = set(strategy, v)

  @volatile private var lastRun: Option[DEMV] = None

  /** Max per-cell iterations of the last transform (reference `get_iters`). */
  def getIters: Long = lastRun.map(_.getIters).getOrElse(0L)

  /** Disparity traces of the last transform (reference `get_disparities`). */
  def getDisparities: Seq[Seq[Double]] = lastRun.map(_.getDisparities).getOrElse(Seq.empty)

  override def transform(ds: Dataset[_]): DataFrame = {
    val demv = new DEMV(
      $(sensitiveVars).toSeq,
      roundLevel = $(roundLevel),
      stop = $(stop),
      seed = $(seed),
      strategy = $(strategy))
    val out = demv.fitTransform(ds.toDF(), $(labelCol))
    // publish diagnostics only after a successful run: assigning before
    // fitTransform would wipe the previous run's getIters/getDisparities
    // when a transform throws (e.g. DEMV's empty-cell error)
    lastRun = Some(demv)
    out
  }

  /** Balancing resamples rows; the schema is preserved exactly
    * (dtype-preservation contract, SURVEY §1.3).
    */
  override def transformSchema(schema: StructType): StructType = {
    val missing = ($(sensitiveVars).toSeq :+ $(labelCol)).filterNot(schema.fieldNames.contains)
    require(missing.isEmpty, s"columns not in schema: ${missing.mkString(", ")}")
    schema
  }

  override def copy(extra: ParamMap): DEMVTransformer = defaultCopy(extra)
}
