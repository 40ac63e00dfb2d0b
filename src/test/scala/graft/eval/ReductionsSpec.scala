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

  test("fitEnsemble returns a normalized mixture over feasible iterates") {
    val ens = Reductions.ExponentiatedGradient.fitEnsemble(
      train, Seq("x1", "x2"), "y", Seq("s1"), bound = 0.45, rounds = 3, eps = 0.05)
    assert(ens.iterates.nonEmpty)
    assert(math.abs(ens.weights.sum - 1.0) < 1e-9)
    assert(ens.weights.forall(w => w >= 0 && w <= 1))
    // mixture losses are convex combinations of iterate losses
    val mix = ens.mixtureGroupLosses
    mix.foreach { case (g, l) =>
      val ls = ens.iterates.map(_.groupLosses(g))
      assert(l >= ls.min - 1e-9 && l <= ls.max + 1e-9)
    }
  }

  test("ensemble transform is a seeded per-row draw over iterate predictions") {
    val ens = Reductions.ExponentiatedGradient.fitEnsemble(
      train, Seq("x1", "x2"), "y", Seq("s1"), bound = 0.45, rounds = 3, eps = 0.05, seed = 9)
    val out = ens.transform(train)
    assert(out.count() === 800)
    val preds = out.select("prediction").collect().map(_.getDouble(0)).toSet
    assert(preds.subsetOf(Set(0.0, 1.0)))
    // same seed -> identical draw; prediction agrees with SOME iterate per row
    val again = ens.transform(train).select("x1", "prediction").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).sorted.toSeq
    val first = out.select("x1", "prediction").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).sorted.toSeq
    assert(again === first)
  }

  test("GridSearch picks a multiplier and returns group losses") {
    val fitted = Reductions.GridSearch.fit(
      train, Seq("x1", "x2"), "y", Seq("s1"), Map("s1" -> 0), bound = 0.2)
    assert(fitted.groupLosses.size === 2)
    assert(fitted.transform(train).count() === 800)
  }
}
