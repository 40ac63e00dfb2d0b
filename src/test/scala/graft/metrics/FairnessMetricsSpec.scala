package graft.metrics

import graft.SparkSpec

/** Golden tests for M1-M6 (SURVEY §2.7) on tiny hand-computed tables,
  * including the zero-denominator branches the reference special-cases
  * (reference `replication_package/src/utils.py:37-60`).
  */
class FairnessMetricsSpec extends SparkSpec {

  // predictions table: (s1, s2, pred, true)
  // unpriv = s1==1: 4 rows; priv: 4 rows
  //   unpriv: pred=1 in 1/4; priv: pred=1 in 3/4
  private lazy val predDF = {
    import spark.implicits._
    Seq(
      // s1, s2, pred, y_true
      (1, 0, 1, 1), (1, 0, 0, 1), (1, 1, 0, 0), (1, 1, 0, 0),
      (0, 0, 1, 1), (0, 0, 1, 0), (0, 1, 1, 1), (0, 1, 0, 0)
    ).toDF("s1", "s2", "pred", "y_true")
  }

  private lazy val m = FairnessMetrics.compute(
    predDF, Seq("s1", "s2"), GroupCondition(Map("s1" -> 1)), "pred", "y_true", positiveLabel = 1)

  test("statistical parity = P(pos|unpriv) - P(pos|priv)  (utils.py:23-30)") {
    assert(math.abs(m.statisticalParity - (0.25 - 0.75)) < 1e-12)
  }

  test("disparate impact = min(u/p, p/u) (utils.py:15-20)") {
    assert(math.abs(m.disparateImpact - (0.25 / 0.75)) < 1e-12)
  }

  test("equalized odds with the reference's quirky conditionals (utils.py:33-62)") {
    // reference 'TPR' = P(true=pos | group, pred=pos):
    //   unpriv: pred=1 rows: 1 with true=1 -> 1/1 = 1.0
    //   priv:   pred=1 rows: 3, true=1 in 2 -> 2/3
    // reference 'FPR' = (pred=pos & true!=pos) / (pred!=pos):
    //   unpriv: numerator 0, denominator 3 -> 0
    //   priv:   numerator 1, denominator 1 -> 1
    val expected = math.max(math.abs(1.0 - 2.0 / 3.0), math.abs(0.0 - 1.0))
    assert(math.abs(m.equalizedOdds - expected) < 1e-12)
  }

  test("zero-one-loss difference over the sensitive tuple (utils.py:116-121)") {
    // groups (s1,s2): (1,0): correct 1/2 -> loss .5 ; (1,1): correct 2/2 -> 0
    //                 (0,0): correct 1/2 -> .5 ; (0,1): 2/2 -> 0
    assert(math.abs(m.zeroOneLossDiff - 0.5) < 1e-12)
  }

  test("accuracy (utils.py:260)") {
    assert(math.abs(m.accuracy - 6.0 / 8.0) < 1e-12)
  }

  test("zero denominators make the affected rate 0, not NaN (utils.py:37-60)") {
    import spark.implicits._
    // unpriv group never predicted positive -> its TPR denominator is 0
    val df = Seq(
      (1, 0, 0), (1, 0, 1),
      (0, 1, 1), (0, 0, 0)
    ).toDF("s1", "pred", "y_true")
    val r = FairnessMetrics.compute(
      df, Seq("s1"), GroupCondition(Map("s1" -> 1)), "pred", "y_true", 1)
    assert(!r.equalizedOdds.isNaN)
  }

  test("disparate impact when u == 0 is u/p (=0) per the reference branch") {
    import spark.implicits._
    val df = Seq((1, 0, 0), (1, 0, 1), (0, 1, 1), (0, 1, 0)).toDF("s1", "pred", "y_true")
    val r = FairnessMetrics.compute(
      df, Seq("s1"), GroupCondition(Map("s1" -> 1)), "pred", "y_true", 1)
    assert(r.disparateImpact === 0.0)
  }

  test("average odds difference: per-class OvR rates with the reference's missing-parens bug (utils.py:97-113)") {
    // binary case on the main fixture; compute by hand:
    // unpriv (s1=1): y_true: 1,1,0,0; pred: 1,0,0,0
    //   class 1: TP=1 FN=1 FP=0 TN=2 -> TPR=.5 FPR=0
    // priv (s1=0): y_true: 1,0,1,0; pred: 1,1,1,0
    //   class 1: TP=2 FN=0 FP=1 TN=1 -> TPR=1 FPR=.5
    val aod = FairnessMetrics.averageOddsDifference(
      predDF, GroupCondition(Map("s1" -> 1)), "pred", "y_true")
    // faithful bug: (fprU-fprP) + (tprU-tprP)/2 = (0-.5) + (.5-1)/2 = -.75
    assert(math.abs(aod(1) - (-0.75)) < 1e-12)
    // fixed: ((0-.5) + (.5-1))/2 = -.5
    val fixed = FairnessMetrics.averageOddsDifferenceFixed(
      predDF, GroupCondition(Map("s1" -> 1)), "pred", "y_true")
    assert(math.abs(fixed(1) - (-0.5)) < 1e-12)
    // class 0 mirrors: unpriv class0: TP=2 FN=0 FP=1 TN=1 -> TPR=1, FPR=.5
    //                  priv class0:   TP=1 FN=1 FP=0 TN=2 -> TPR=.5, FPR=0
    assert(math.abs(aod(0) - (0.5 + 0.25)) < 1e-12)
  }

  test("average odds difference: int labels + double predictions yield one class set") {
    // the standard spark.ml shape: IntegerType y_true, DoubleType
    // prediction — Int 1 and Double 1.0 are the SAME class and must not
    // double-count in the result map
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val mixed = predDF.withColumn("pred", col("pred").cast("double"))
    val aod = FairnessMetrics.averageOddsDifference(
      mixed, GroupCondition(Map("s1" -> 1)), "pred", "y_true")
    assert(aod.size === 2, s"expected 2 classes, got keys ${aod.keySet}")
    // numeric class keys are canonicalized to Double, so exact lookup is
    // part of the contract — no collectFirst scan needed
    assert(aod.keySet === Set(0.0, 1.0), s"non-canonical keys: ${aod.keySet}")
    assert(math.abs(aod(1.0) - (-0.75)) < 1e-12)
    assert(math.abs(aod(0.0) - 0.75) < 1e-12)
  }

  test("GroupCondition renders a conjunction and its whole-negation") {
    import spark.implicits._
    val df = Seq((1, 1), (1, 0), (0, 1)).toDF("a", "b")
    val gc = GroupCondition(Map("a" -> 1, "b" -> 1))
    assert(df.where(gc.column).count() === 1)
    assert(df.where(gc.negated).count() === 2) // negation of the WHOLE conjunction
  }
}
