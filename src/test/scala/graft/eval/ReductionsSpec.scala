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
    // same seed -> identical draw
    val again = ens.transform(train).select("x1", "prediction").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).sorted.toSeq
    val first = out.select("x1", "prediction").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).sorted.toSeq
    assert(again === first)
    // prediction agrees with SOME iterate per row — a draw that ignores
    // the iterates (e.g. constant output) must not pass
    val key = (r: org.apache.spark.sql.Row) => (r.getDouble(0), r.getDouble(1))
    val ensPred = out.select("x1", "x2", "prediction").collect()
      .map(r => key(r) -> r.getDouble(2)).toMap
    val iteratePreds = ens.iterates.map(_.model.transform(train)
      .select("x1", "x2", "prediction").collect()
      .map(r => key(r) -> r.getDouble(2)).toMap)
    ensPred.foreach { case (k, p) =>
      assert(iteratePreds.exists(m => m(k) == p),
        s"row $k prediction $p matches no iterate's prediction")
    }
  }

  test("ensemble draw mixes disagreeing iterates per row, not one constant pick") {
    import org.apache.spark.sql.Row
    // two single-iterate fits on OPPOSITE labels guarantee per-row
    // disagreement, making the membership check above impossible to
    // satisfy vacuously: the draw must route each row to A or B
    val flipped = train.withColumn("y", lit(1) - col("y"))
    val itA = Reductions.ExponentiatedGradient.fitEnsemble(
      train, Seq("x1", "x2"), "y", Seq("s1"), bound = 0.45, rounds = 1).iterates.head
    val itB = Reductions.ExponentiatedGradient.fitEnsemble(
      flipped, Seq("x1", "x2"), "y", Seq("s1"), bound = 0.45, rounds = 1).iterates.head
    val mixed = Reductions.FittedEnsemble(Seq(itA, itB), Seq(0.5, 0.5), seed = 9)
    val key = (r: Row) => (r.getDouble(0), r.getDouble(1))
    val predOf = (df: org.apache.spark.sql.DataFrame) =>
      df.select("x1", "x2", "prediction").collect().map(r => key(r) -> r.getDouble(2)).toMap
    val pA = predOf(itA.model.transform(train))
    val pB = predOf(itB.model.transform(train))
    val disagree = pA.keys.filter(k => pA(k) != pB(k)).toSet
    assert(disagree.size > 100, "opposite-label models barely disagree — fixture broken")
    val pM = predOf(mixed.transform(train))
    // every row matches one of its iterates
    pM.foreach { case (k, p) => assert(p == pA(k) || p == pB(k)) }
    // and on disagreeing rows both iterates get picked: the draw is real
    val fromA = disagree.count(k => pM(k) == pA(k))
    assert(fromA > 0 && fromA < disagree.size,
      s"draw picked one iterate for all ${disagree.size} disagreeing rows — not a mixture")
  }

  test("GridSearch picks a multiplier and returns group losses") {
    val fitted = Reductions.GridSearch.fit(
      train, Seq("x1", "x2"), "y", Seq("s1"), Map("s1" -> 0), bound = 0.2)
    assert(fitted.groupLosses.size === 2)
    assert(fitted.transform(train).count() === 800)
  }
}
