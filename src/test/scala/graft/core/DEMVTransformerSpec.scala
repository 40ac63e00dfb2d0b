package graft.core

import graft.SparkSpec
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler

class DEMVTransformerSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    val rng = new scala.util.Random(21)
    (0 until 300).map { i =>
      val s1 = if (rng.nextDouble() < 0.7) 1 else 0
      val y = if (rng.nextDouble() < (if (s1 == 1) 0.7 else 0.3)) 1 else 0
      (rng.nextGaussian(), rng.nextGaussian(), s1, y)
    }.toDF("f1", "f2", "s1", "y")
  }

  test("works standalone: balances and preserves schema") {
    val t = new DEMVTransformer().setSensitiveVars(Array("s1")).setLabelCol("y")
    val out = t.transform(df)
    assert(out.schema === df.schema)
    assert(t.getIters > 0)
    assert(t.getDisparities.nonEmpty)
  }

  test("composes inside a spark.ml preprocessing Pipeline (train-side usage)") {
    // DEMV is a PRE-PROCESSING stage: compose it in a preprocessing
    // pipeline (or call before Pipeline.fit). Inside a full inference
    // pipeline it would re-balance test data too — documented usage note.
    val prep = new Pipeline().setStages(Array(
      new DEMVTransformer().setSensitiveVars(Array("s1")).setLabelCol("y"),
      new VectorAssembler().setInputCols(Array("f1", "f2", "s1")).setOutputCol("features")))
    val balanced = prep.fit(df).transform(df)
    assert(balanced.columns.contains("features"))
    val clf = new LogisticRegression().setLabelCol("y").setFeaturesCol("features").fit(balanced)
    assert(clf.transform(balanced).columns.contains("prediction"))
  }

  test("transformSchema validates columns") {
    val t = new DEMVTransformer().setSensitiveVars(Array("nope")).setLabelCol("y")
    val e = intercept[IllegalArgumentException] { t.transformSchema(df.schema) }
    assert(e.getMessage.contains("nope"))
  }
}
