package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PostProcessSpec extends SparkSpec {

  test("withCombined reproduces the reference's last-key-wins bug (utils.py:278-281)") {
    import spark.implicits._
    val df = Seq((1, 0, 0), (1, 1, 0), (0, 1, 0)).toDF("a", "b", "pred")
    // condition list (a=1, b=1): reference's loop only applies the LAST key
    val out = PostProcess.withCombined(df, Seq("a" -> 1, "b" -> 1))
    val combined = out.orderBy("a", "b").select("combined").collect().map(_.getInt(0))
    // rows ordered (0,1),(1,0),(1,1): combined = b==1 -> 1, 0, 1
    assert(combined.toSeq === Seq(1, 0, 1))
  }

  test("adjust equalizes per-group predicted-class distributions exactly") {
    import spark.implicits._
    // group 0: 80 pred=1, 20 pred=0; group 1: 20 pred=1, 80 pred=0
    val rows = (0 until 80).map(i => (0, 1, i)) ++ (0 until 20).map(i => (0, 0, 100 + i)) ++
      (0 until 20).map(i => (1, 1, 200 + i)) ++ (0 until 80).map(i => (1, 0, 300 + i))
    val df = rows.toDF("g", "pred", "id")
    val out = PostProcess.adjust(df, "g", "pred", seed = 1)
    val dist = out.groupBy("g", "pred").count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // overall: 100 pred=1 / 200 -> each group of 100 gets exactly 50/50
    assert(dist((0, 1)) === 50L)
    assert(dist((0, 0)) === 50L)
    assert(dist((1, 1)) === 50L)
    assert(dist((1, 0)) === 50L)
    assert(out.count() === 200)
  }

  test("adjust is a relabeling: row count and non-pred columns untouched") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i % 2, if (i < 70) 1 else 0, i)).toDF("g", "pred", "id")
    val out = PostProcess.adjust(df, "g", "pred", seed = 2)
    assert(out.count() === 100)
    assert(out.select("id").distinct().count() === 100)
  }

  test("already-balanced predictions pass through unchanged") {
    import spark.implicits._
    val df = Seq((0, 1), (0, 0), (1, 1), (1, 0)).toDF("g", "pred")
    val out = PostProcess.adjust(df, "g", "pred")
    val dist = out.groupBy("g", "pred").count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(dist.values.forall(_ === 1L))
  }

  // ------------------------------------------------------------------
  // equalized odds (reference BinaryBalancer TPR/FPR constraint)
  // ------------------------------------------------------------------

  test("equalizedOddsPlan: common target inside both groups' feasible sets") {
    // g0: TPR 0.9, FPR 0.4; g1: TPR 0.6, FPR 0.2
    val stats: Map[Any, (Long, Long, Long, Long)] = Map(
      (0: Any) -> ((1800L, 200L, 800L, 1200L)),
      (1: Any) -> ((1200L, 800L, 400L, 1600L)))
    val plan = PostProcess.equalizedOddsPlan(stats)
    // mixing coefficients are probabilities
    plan.mix.values.foreach { case (a, b) =>
      assert(a >= 0.0 && a <= 1.0); assert(b >= 0.0 && b <= 1.0)
    }
    // both groups land exactly on the target analytically
    stats.foreach { case (g, (tp, fn, fp, tn)) =>
      val tpr = tp.toDouble / (tp + fn); val fpr = fp.toDouble / (fp + tn)
      val (a, b) = plan.mix(g)
      val newTpr = a * tpr + b * (1 - tpr)
      val newFpr = a * fpr + b * (1 - fpr)
      assert(math.abs(newTpr - plan.targetTpr) < 1e-9, s"group $g tpr")
      assert(math.abs(newFpr - plan.targetFpr) < 1e-9, s"group $g fpr")
    }
    // the target is inside the unit square and not degenerate
    assert(plan.targetTpr >= plan.targetFpr - 1e-9)
  }

  test("equalizedOddsPlan: identical groups keep their own rates") {
    val stats: Map[Any, (Long, Long, Long, Long)] = Map(
      (0: Any) -> ((900L, 100L, 200L, 800L)),
      (1: Any) -> ((900L, 100L, 200L, 800L)))
    val plan = PostProcess.equalizedOddsPlan(stats)
    // feasible region is the group's own quad; the accuracy-max vertex is
    // the classifier's own operating point
    assert(math.abs(plan.targetTpr - 0.9) < 1e-9)
    assert(math.abs(plan.targetFpr - 0.2) < 1e-9)
    plan.mix.values.foreach { case (a, b) =>
      assert(math.abs(a - 1.0) < 1e-9); assert(math.abs(b) < 1e-9)
    }
  }

  test("equalizeOdds: realized per-group TPR/FPR converge to the target") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // build exact counts: g0 (tp 1800, fn 200, fp 800, tn 1200),
    //                     g1 (tp 1200, fn 800, fp 400, tn 1600)
    def cell(g: Int, y: Int, p: Int, n: Int, base: Int) =
      (0 until n).map(i => (g, y, p, base + i))
    val rows = cell(0, 1, 1, 1800, 0) ++ cell(0, 1, 0, 200, 10000) ++
      cell(0, 0, 1, 800, 20000) ++ cell(0, 0, 0, 1200, 30000) ++
      cell(1, 1, 1, 1200, 40000) ++ cell(1, 1, 0, 800, 50000) ++
      cell(1, 0, 1, 400, 60000) ++ cell(1, 0, 0, 1600, 70000)
    val df = rng.shuffle(rows).toDF("g", "y", "pred", "id").repartition(4)
    val out = PostProcess.equalizeOdds(df, "g", "pred", "y", seed = 3)
    assert(out.count() === 8000)

    val stats: Map[Any, (Long, Long, Long, Long)] = Map(
      (0: Any) -> ((1800L, 200L, 800L, 1200L)),
      (1: Any) -> ((1200L, 800L, 400L, 1600L)))
    val plan = PostProcess.equalizedOddsPlan(stats)
    val cm = out.groupBy("g", "y", "pred").count().collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
      .withDefaultValue(0L)
    Seq(0, 1).foreach { g =>
      val tpr = cm((g, 1, 1)).toDouble / (cm((g, 1, 1)) + cm((g, 1, 0)))
      val fpr = cm((g, 0, 1)).toDouble / (cm((g, 0, 1)) + cm((g, 0, 0)))
      // flips are label-blind: realized rates are hypergeometric around the
      // target, sigma ~ 0.011 at these cell sizes
      assert(math.abs(tpr - plan.targetTpr) < 0.05, s"g=$g tpr=$tpr vs ${plan.targetTpr}")
      assert(math.abs(fpr - plan.targetFpr) < 0.05, s"g=$g fpr=$fpr vs ${plan.targetFpr}")
    }
  }

  test("equalizeOdds rejects non-binary domains") {
    import spark.implicits._
    val df = Seq((0, 2, 1), (1, 0, 1)).toDF("g", "y", "pred")
    intercept[IllegalArgumentException] {
      PostProcess.equalizeOdds(df, "g", "pred", "y")
    }
  }
}
