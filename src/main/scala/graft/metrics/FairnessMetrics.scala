package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** The unprivileged-group condition: a conjunction of column = value
  * equalities. The reference renders it to a pandas query string
  * `"k==v&..."` and its negation `"~(k==v&...)"`
  * (reference `replication_package/src/utils.py:24,66-68`).
  */
final case class GroupCondition(values: Map[String, Any]) {
  require(values.nonEmpty, "GroupCondition must constrain at least one column")
  /** Catalyst conjunction: unprivileged-group membership. */
  def column: Column =
    values.map { case (k, v) => col(k) === lit(v) }.reduce(_ && _)
  /** The privileged group is the NEGATION of the whole conjunction
    * (reference `utils.py:28-29`), not the complementary value tuple.
    */
  def negated: Column = !column
}

/** All fairness metrics of one predictions table, computed together.
  *
  * Semantics mirror `replication_package/src/utils.py:15-121` including its
  * quirks (documented per field). Zero denominators that raise
  * ZeroDivisionError in the reference yield NaN/Infinity here — documented
  * deviation rather than a crash.
  *
  * @param statisticalParity  P(pred=pos | unpriv) - P(pred=pos | priv)
  *                           (`utils.py:23-30`)
  * @param disparateImpact    min(u/p, p/u) when u != 0 else u/p
  *                           (`utils.py:15-20`)
  * @param equalizedOdds      max(|tprU - tprP|, |fprU - fprP|) where the
  *                           reference's "TPR" is P(true=pos | group,
  *                           pred=pos) and its "FPR" numerator is
  *                           (pred=pos & true!=pos) over the pred!=pos
  *                           denominator — faithfully reproduced, quirks and
  *                           all (`utils.py:33-62`); any empty denominator
  *                           makes that rate 0
  * @param zeroOneLossDiff    max - min of per-sensitive-group 0-1 loss, the
  *                           group key being the TUPLE of sensitive columns
  *                           (fairlearn MetricFrame.difference,
  *                           `utils.py:116-121,259`)
  * @param accuracy           plain accuracy (`utils.py:260`)
  */
final case class MetricsResult(
    statisticalParity: Double,
    disparateImpact: Double,
    equalizedOdds: Double,
    zeroOneLossDiff: Double,
    accuracy: Double)

/** Fused computation: ONE groupBy over (sensitive columns, three boolean
  * outcomes) — at most 2^n * 8 cells collected — then driver arithmetic.
  * The reference re-scans the table ~12 times per metric call with pandas
  * `query`+`len` (`utils.py:34-60`); at scale that is ~12 full passes vs our
  * one.
  */
object FairnessMetrics {

  /** @param predDF        table containing predictions and ground truth
    * @param sensitiveCols all sensitive columns (zero-one-loss groups);
    *                      must be a superset of `unpriv.values.keySet`
    * @param unpriv        unprivileged-group condition
    * @param predCol       predicted-label column (the reference's
    *                      `label_name` on `data_pred`)
    * @param trueCol       ground-truth column (the reference's `y_true`)
    * @param positiveLabel the positive class value
    */
  def compute(
      predDF: DataFrame,
      sensitiveCols: Seq[String],
      unpriv: GroupCondition,
      predCol: String,
      trueCol: String,
      positiveLabel: Any): MetricsResult = {
    require(unpriv.values.keySet.subsetOf(sensitiveCols.toSet),
      "unpriv condition columns must be within sensitiveCols")
    val predPos = (col(predCol) === lit(positiveLabel)).cast("int").as("__pred_pos")
    val truePos = (col(trueCol) === lit(positiveLabel)).cast("int").as("__true_pos")
    val correct = (col(predCol) === col(trueCol)).cast("int").as("__correct")
    val cells: Array[Row] = predDF
      .select(sensitiveCols.map(col) ++ Seq(predPos, truePos, correct): _*)
      .groupBy((sensitiveCols :+ "__pred_pos").map(col) ++ Seq(col("__true_pos"), col("__correct")): _*)
      .count()
      .collect()

    val n = sensitiveCols.length
    final case class Cell(sens: Seq[Any], predPos: Boolean, truePos: Boolean, correct: Boolean, cnt: Long)
    val cs = cells.map { r =>
      // a null prediction/label makes the comparison columns null and the
      // getInt below would throw a bare NPE — name the culprit instead
      require(!r.isNullAt(n) && !r.isNullAt(n + 1) && !r.isNullAt(n + 2),
        s"compute: null value in '$predCol' or '$trueCol' — fairness metrics " +
          "need non-null predictions and labels (filter or impute first)")
      Cell((0 until n).map(r.get), r.getInt(n) == 1, r.getInt(n + 1) == 1, r.getInt(n + 2) == 1, r.getLong(n + 3))
    }
    val sensIdx = sensitiveCols.zipWithIndex.toMap
    def inUnpriv(c: Cell): Boolean = unpriv.values.forall { case (k, v) =>
      valueEq(c.sens(sensIdx(k)), v)
    }
    def cnt(p: Cell => Boolean): Long = cs.iterator.filter(p).map(_.cnt).sum

    val total = cnt(_ => true)
    val nU = cnt(inUnpriv)
    val nP = total - nU
    val nUPos = cnt(c => inUnpriv(c) && c.predPos)
    val nPPos = cnt(c => !inUnpriv(c) && c.predPos)

    // statistical parity (utils.py:23-30): op order preserved
    val uProb = nUPos.toDouble / nU.toDouble
    val pProb = nPPos.toDouble / nP.toDouble
    val statPar = uProb - pProb

    // disparate impact (utils.py:15-20)
    val dispImp = if (uProb != 0) math.min(uProb / pProb, pProb / uProb) else uProb / pProb

    // equalized odds (utils.py:33-62) — reproduce the reference's exact
    // conditional counts:
    def rate(num: Long, den: Long): Double = if (den == 0) 0.0 else num.toDouble / den.toDouble
    val uTpr = rate(cnt(c => inUnpriv(c) && c.predPos && c.truePos), nUPos)
    val pTpr = rate(cnt(c => !inUnpriv(c) && c.predPos && c.truePos), nPPos)
    val uFpr = rate(cnt(c => inUnpriv(c) && c.predPos && !c.truePos), cnt(c => inUnpriv(c) && !c.predPos))
    val pFpr = rate(cnt(c => !inUnpriv(c) && c.predPos && !c.truePos), cnt(c => !inUnpriv(c) && !c.predPos))
    val eqOdds = math.max(math.abs(uTpr - pTpr), math.abs(uFpr - pFpr))

    // zero-one-loss difference over the sensitive TUPLE (utils.py:116-121)
    val lossByGroup = cs.groupBy(_.sens).map { case (_, gs) =>
      val tot = gs.map(_.cnt).sum
      val wrong = gs.filter(!_.correct).map(_.cnt).sum
      wrong.toDouble / tot.toDouble
    }
    val zolDiff = if (lossByGroup.isEmpty) 0.0 else lossByGroup.max - lossByGroup.min

    val acc = cnt(_.correct).toDouble / total.toDouble

    MetricsResult(statPar, dispImp, eqOdds, zolDiff, acc)
  }

  private def valueEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Number, y: Number) => x.doubleValue() == y.doubleValue()
    case _ => a == b
  }

  /** M4 — average odds difference (reference `utils.py:97-113`): per-class
    * one-vs-rest TPR/FPR from each group's confusion matrix, combined as
    *
    *   (fprU - fprP) + (tprU - tprP) / 2
    *
    * NOTE the reference's missing parentheses: only the TPR difference is
    * halved. Reproduced faithfully here (SURVEY §2.7 M4 — the documented
    * default); [[averageOddsDifferenceFixed]] computes the intended
    * `((fprU - fprP) + (tprU - tprP)) / 2`. One aggregation pass; per-class
    * results keyed by class value. A class absent from a group yields NaN
    * rates (the reference crashes on shape mismatch instead).
    */
  def averageOddsDifference(
      predDF: DataFrame,
      unpriv: GroupCondition,
      predCol: String,
      trueCol: String): Map[Any, Double] =
    aodImpl(predDF, unpriv, predCol, trueCol, faithfulBug = true)

  /** M4 with the parenthesization the formula intends. */
  def averageOddsDifferenceFixed(
      predDF: DataFrame,
      unpriv: GroupCondition,
      predCol: String,
      trueCol: String): Map[Any, Double] =
    aodImpl(predDF, unpriv, predCol, trueCol, faithfulBug = false)

  private def aodImpl(
      predDF: DataFrame,
      unpriv: GroupCondition,
      predCol: String,
      trueCol: String,
      faithfulBug: Boolean): Map[Any, Double] = {
    val cells = predDF
      .groupBy(unpriv.column.as("__u"), col(trueCol).as("__t"), col(predCol).as("__p"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0),
          "averageOddsDifference: the group condition evaluated to null " +
            "(null sensitive value) — filter or impute sensitive columns first")
        (r.getBoolean(0), r.get(1), r.get(2)) -> r.getLong(3)
      }.toMap
    // dedupe classes under the same numeric-equality semantics as the
    // per-class rates (valueEq): trueCol and predCol may carry the same
    // class in different numeric types (int labels vs spark.ml double
    // predictions), and a raw `distinct` would keep Int 1 and Double 1.0
    // as two classes, double-counting every per-class result
    // canonicalize Number classes to their doubleValue so the key a
    // caller sees in the result Map is stable (Double 1.0, never an
    // iteration-order-dependent Int 1 vs Double 1.0 coin flip) and
    // result(1.0) exact lookups always hit
    val classes = cells.keysIterator.flatMap { case (_, t, p) => Iterator(t, p) }
      .map { case n: Number => n.doubleValue(): Any; case v => v }
      .toSeq.distinct
      .sortBy(identity)(graft.core.DEMV.anyOrdering) // np.unique order
    def rates(uGroup: Boolean): Map[Any, (Double, Double)] = {
      val g = cells.collect { case ((u, t, p), n) if u == uGroup => (t, p) -> n }
      val total = g.values.sum.toDouble
      classes.map { c =>
        val tp = g.collect { case ((t, p), n) if valueEq(t, c) && valueEq(p, c) => n }.sum.toDouble
        val fn = g.collect { case ((t, p), n) if valueEq(t, c) && !valueEq(p, c) => n }.sum.toDouble
        val fp = g.collect { case ((t, p), n) if !valueEq(t, c) && valueEq(p, c) => n }.sum.toDouble
        val tn = total - tp - fn - fp
        c -> (fp / (fp + tn), tp / (tp + fn)) // (FPR, TPR); 0/0 -> NaN
      }.toMap
    }
    val u = rates(uGroup = true)
    val p = rates(uGroup = false)
    classes.map { c =>
      val (fprU, tprU) = u(c)
      val (fprP, tprP) = p(c)
      val v =
        if (faithfulBug) (fprU - fprP) + (tprU - tprP) / 2
        else ((fprU - fprP) + (tprU - tprP)) / 2
      c -> v
    }.toMap
  }
}
