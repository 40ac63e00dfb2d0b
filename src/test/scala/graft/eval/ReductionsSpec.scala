package graft.eval

import graft.SparkSpec
import graft.data.Generator
import org.apache.spark.sql.functions._

class ReductionsSpec extends SparkSpec {

  // biased dataset: label correlates with s1, so an unconstrained model
  // has asymmetric group losses
  private lazy val train = {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    (0 until 800).map { _ =>
      val s1 = if (rng.nextDouble() < 0.5) 1 else 0
      val x1 = rng.nextGaussian() + (if (s1 == 1) 1.0 else -1.0)
      val x2 = rng.nextGaussian()
      // group 0's labels are noisier -> higher loss without reweighting
      val base = if (x1 + x2 > 0) 1 else 0
      val y = if (s1 == 0 && rng.nextDouble() < 0.3) 1 - base else base
      (x1, x2, s1, y)
    }.toDF("x1", "x2", "s1", "y")
  }

  test("ExponentiatedGradient reduces the max group loss vs the unweighted model") {
    val fitted = Reductions.ExponentiatedGradient.fit(
      train, Seq("x1", "x2"), "y", Seq("s1"), bound = 0.2, rounds = 4)
    assert(fitted.groupLosses.nonEmpty)
    // multipliers moved toward the violating group
    assert(fitted.groupLosses.values.forall(_ <= 0.45))
    // produces predictions
    val pred = fitted.transform(train)
    assert(pred.columns.contains("prediction"))
    assert(pred.count() === 800)
  }

  test("GridSearch picks a multiplier and returns group losses") {
    val fitted = Reductions.GridSearch.fit(
      train, Seq("x1", "x2"), "y", Seq("s1"), Map("s1" -> 0), bound = 0.2)
    assert(fitted.groupLosses.size === 2)
    assert(fitted.transform(train).count() === 800)
  }
}
