package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-processing prediction balancers (SURVEY §2.12 E8): the reference
  * pipes predictions through the `balancers` package's
  * `MulticlassBalancer`/`BinaryBalancer` on a `combined` 0/1 group column
  * (reference `utils.py:275-283,362-379`) — an LP-derived randomized
  * relabeling that equalizes per-group prediction rates.
  *
  * Rebuild: demographic-parity transport on collected statistics. The
  * per-(group, predicted-class) counts are collected (tiny: 2 * L cells),
  * the driver computes each group's class-quota gap vs the overall
  * prediction distribution, and ONE distributed pass relabels a seeded
  * random subset of each (group, class) cell to close the gaps — the exact
  * per-cell counts use the same windowed-rank trick as the core sampler.
  * (The reference's LP variant also equalizes TPR/FPR; the transport here
  * targets the rate constraint — documented simplification, same
  * interface/columns.)
  *
  * The `combined` column derivation reproduces the reference's loop bug
  * faithfully: `tocomb` is REASSIGNED per key, so only the LAST sensitive
  * feature's condition matters (`utils.py:278-281`; SURVEY E8) — kept, with
  * this note, because replication output depends on it.
  */
object PostProcess {

  /** Reference `_model_train2`'s combined-column derivation, bug included:
    * combined = 1 where the LAST (key, value) of the group condition holds.
    */
  def withCombined(predDF: DataFrame, groupCondition: Seq[(String, Any)]): DataFrame = {
    val (k, v) = groupCondition.last
    predDF.withColumn("combined", when(col(k) === lit(v), 1).otherwise(0))
  }

  /** Relabel predictions so every `groupCol` group matches the overall
    * predicted-class distribution (demographic parity across the group).
    * Exact counts, seeded, one extra shuffle (the per-cell rank window).
    */
  def adjust(
      predDF: DataFrame,
      groupCol: String,
      predCol: String,
      seed: Long = 42L): DataFrame = {
    // tiny stats: (group, class) counts + marginals
    val cells = predDF.groupBy(col(groupCol), col(predCol)).count().collect()
      .map(r => (r.get(0), r.get(1)) -> r.getLong(2)).toMap
    val groups = cells.keys.map(_._1).toSeq.distinct
    val classes = cells.keys.map(_._2).toSeq.distinct
    val total = cells.values.sum.toDouble
    val classShare: Map[Any, Double] = classes.map { c =>
      c -> cells.collect { case ((_, cc), n) if cc == c => n }.sum / total
    }.toMap

    // per group: how many rows of each class to KEEP (largest-remainder to
    // the group's size), surplus classes donate to deficit classes in a
    // fixed class order — a deterministic transport plan
    final case class Move(group: Any, fromClass: Any, toClass: Any, n: Long)
    val moves = scala.collection.mutable.ArrayBuffer.empty[Move]
    groups.foreach { g =>
      val gSize = classes.map(c => cells.getOrElse((g, c), 0L)).sum
      val quotas: Map[Any, Long] = {
        val raw = classes.map(c => c -> classShare(c) * gSize)
        val floors = raw.map { case (c, x) => c -> x.toLong }.toMap
        var rem = gSize - floors.values.sum
        // largest-remainder order; ties broken by class string so the quota
        // is deterministic regardless of Map iteration order (the DuckDB
        // oracle for q31 replays exactly this rank)
        val order = raw.sortBy { case (c, x) => (-(x - x.toLong), String.valueOf(c)) }.map(_._1)
        val out = scala.collection.mutable.Map(floors.toSeq: _*)
        var i = 0
        while (rem > 0) { out(order(i % order.length)) += 1; rem -= 1; i += 1 }
        out.toMap
      }
      val surplus = scala.collection.mutable.Queue(classes.flatMap { c =>
        val extra = cells.getOrElse((g, c), 0L) - quotas(c)
        if (extra > 0) Some(c -> extra) else None
      }: _*)
      val deficit = scala.collection.mutable.Queue(classes.flatMap { c =>
        val miss = quotas(c) - cells.getOrElse((g, c), 0L)
        if (miss > 0) Some(c -> miss) else None
      }: _*)
      while (surplus.nonEmpty && deficit.nonEmpty) {
        val (sc, sn) = surplus.dequeue()
        val (dc, dn) = deficit.dequeue()
        val n = math.min(sn, dn)
        moves += Move(g, sc, dc, n)
        if (sn > n) surplus.prepend(sc -> (sn - n))
        if (dn > n) deficit.prepend(dc -> (dn - n))
      }
    }

    if (moves.isEmpty) return predDF
    // one salted exact-count pass: a plain Window.partitionBy(group, class)
    // would put each cell in ONE task — the single-task hazard the core
    // sampler already solves; ExactRelabel salts the rank windows
    val byCell: Map[Seq[Any], Seq[(Any, Long)]] = moves.toSeq
      .groupBy(m => Seq(m.group, m.fromClass))
      .map { case (cell, ms) => cell -> ms.map(m => (m.toClass, m.n)) }
    graft.core.ExactRelabel.relabel(predDF, Seq(groupCol, predCol), predCol, byCell, seed)
  }

  /** Reference `blackbox`/`blackboxbin` surface: derive `combined`, adjust
    * the prediction column across it (`utils.py:362-379`).
    */
  def blackbox(
      predDF: DataFrame,
      groupCondition: Seq[(String, Any)],
      predCol: String,
      seed: Long = 42L): DataFrame =
    adjust(withCombined(predDF, groupCondition), "combined", predCol, seed)

  // ------------------------------------------------------------------
  // Equalized-odds post-processing (the reference BinaryBalancer's other
  // constraint, `utils.py:307-316`): equalize per-group TPR AND FPR, not
  // just prediction rates. Hardt/Price/Srebro 2016 derived-predictor
  // semantics: the relabeled prediction depends only on (group, yhat) via
  // mixing probabilities, so each group's achievable (FPR, TPR) set is the
  // convex hull of {(0,0), (FPR_g, TPR_g), (1,1), (1-FPR_g, 1-TPR_g)};
  // the common target is the accuracy-optimal vertex of the intersection
  // of those hulls. Everything is driver arithmetic on the 4K confusion
  // counts; ONE distributed pass applies exact-count flips.
  // ------------------------------------------------------------------

  /** Per-group mixing plan toward the common (targetFpr, targetTpr).
    * `mix(g) = (a, b)`: P(yhat'=1 | yhat=1) = a, P(yhat'=1 | yhat=0) = b.
    */
  final case class OddsPlan(
      targetTpr: Double,
      targetFpr: Double,
      mix: Map[Any, (Double, Double)])

  /** Compute the equalized-odds plan from per-group confusion counts
    * `(tp, fn, fp, tn)`. Pure driver geometry: Sutherland-Hodgman clip of
    * the groups' feasible quadrilaterals, then the vertex maximizing
    * overall accuracy `tpr*P(y=1) - fpr*P(y=0)` (deterministic tie-break:
    * lower fpr, then higher tpr).
    */
  def equalizedOddsPlan(stats: Map[Any, (Long, Long, Long, Long)]): OddsPlan = {
    require(stats.nonEmpty, "equalizedOddsPlan needs at least one group")
    val eps = 1e-12
    val rates = stats.map { case (g, (tp, fn, fp, tn)) =>
      require(tp + fn > 0 && fp + tn > 0,
        s"group $g needs both classes present to define TPR/FPR")
      g -> (fp.toDouble / (fp + tn), tp.toDouble / (tp + fn)) // (fpr, tpr)
    }
    val pos = stats.valuesIterator.map(s => s._1 + s._2).sum.toDouble
    val neg = stats.valuesIterator.map(s => s._3 + s._4).sum.toDouble
    val p1 = pos / (pos + neg)

    val (tFpr, tTpr) =
      if (rates.values.exists { case (f, t) => math.abs(t - f) < eps }) {
        // a group indistinguishable from random forces the target onto the
        // diagonal; pick the accuracy-optimal end
        if (p1 >= 0.5) (1.0, 1.0) else (0.0, 0.0)
      } else {
        // clip the quadrilaterals, ccw winding: below-diagonal vertex first
        // ((0,0) -> Rbar -> (1,1) -> R for R above the diagonal)
        def quad(f: Double, t: Double): Seq[(Double, Double)] =
          if (t > f) Seq((0.0, 0.0), (1 - f, 1 - t), (1.0, 1.0), (f, t))
          else Seq((0.0, 0.0), (f, t), (1.0, 1.0), (1 - f, 1 - t))
        val polys = rates.values.map { case (f, t) => quad(f, t) }
        val clipped = polys.reduce(clipConvex)
        require(clipped.nonEmpty, "empty feasible region (numeric degeneracy)")
        val best = clipped.maxBy { case (f, t) =>
          (t * p1 - f * (1 - p1), -f, t) // accuracy, then deterministic ties
        }
        best
      }

    val mix = rates.map { case (g, (f, t)) =>
      val det = t - f
      val (a, b) =
        if (math.abs(det) < eps) (tTpr, tTpr) // degenerate: constant mixing
        else (
          ((1 - f) * tTpr - (1 - t) * tFpr) / det,
          (t * tFpr - f * tTpr) / det)
      g -> (clamp01(a), clamp01(b))
    }
    OddsPlan(tTpr, tFpr, mix)
  }

  private def clamp01(x: Double): Double = math.min(1.0, math.max(0.0, x))

  /** Sutherland-Hodgman: intersect convex polygon `subject` with convex
    * clip polygon `clip` (both ccw).
    */
  private def clipConvex(
      subject: Seq[(Double, Double)],
      clip: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    def inside(p: (Double, Double), a: (Double, Double), b: (Double, Double)): Boolean =
      (b._1 - a._1) * (p._2 - a._2) - (b._2 - a._2) * (p._1 - a._1) >= -1e-12
    def intersect(p: (Double, Double), q: (Double, Double),
        a: (Double, Double), b: (Double, Double)): (Double, Double) = {
      val a1 = q._2 - p._2; val b1 = p._1 - q._1
      val c1 = a1 * p._1 + b1 * p._2
      val a2 = b._2 - a._2; val b2 = a._1 - b._1
      val c2 = a2 * a._1 + b2 * a._2
      val det = a1 * b2 - a2 * b1
      if (math.abs(det) < 1e-18) p
      else ((b2 * c1 - b1 * c2) / det, (a1 * c2 - a2 * c1) / det)
    }
    clip.indices.foldLeft(subject) { (poly, i) =>
      if (poly.isEmpty) poly
      else {
        val a = clip(i); val b = clip((i + 1) % clip.length)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
        poly.indices.foreach { j =>
          val p = poly(j); val q = poly((j + 1) % poly.length)
          val pIn = inside(p, a, b); val qIn = inside(q, a, b)
          if (pIn) out += p
          if (pIn != qIn) out += intersect(p, q, a, b)
        }
        out.toSeq
      }
    }
  }

  /** Relabel binary predictions so every group's realized TPR and FPR move
    * to the common accuracy-optimal target (equalized odds). Labels are
    * used only to COMPUTE the plan (tiny collected confusion counts); the
    * applied flip depends on (group, yhat) alone, per the derived-predictor
    * contract, so realized rates match the target in expectation (exact-
    * count seeded flips, hypergeometric noise ~ 1/sqrt(cell)).
    */
  def equalizeOdds(
      predDF: DataFrame,
      groupCol: String,
      predCol: String,
      labelCol: String,
      seed: Long = 42L): DataFrame = {
    // one aggregation serves both the confusion counts AND the original
    // prediction values (grouping by the raw column too costs nothing —
    // it is functionally determined by its int cast within a cell — and
    // saves the second full scan a separate distinct() would pay)
    val cellRows = predDF
      .groupBy(col(groupCol), col(labelCol).cast("int").as("__y"),
        col(predCol).cast("int").as("__p"), col(predCol).as("__praw"))
      .count().collect()
    val counts = cellRows
      .groupBy(r => (r.get(0), r.getInt(1), r.getInt(2)))
      .map { case (k, rs) => k -> rs.map(_.getLong(4)).sum }
    val domain = counts.keys.flatMap(k => Seq(k._2, k._3)).toSet -- Set(0, 1)
    require(domain.isEmpty,
      s"equalizeOdds needs binary 0/1 labels and predictions, found: $domain")
    val groups = counts.keys.map(_._1).toSeq.distinct
    val stats: Map[Any, (Long, Long, Long, Long)] = groups.map { g =>
      g -> ((
        counts.getOrElse((g, 1, 1), 0L), counts.getOrElse((g, 1, 0), 0L),
        counts.getOrElse((g, 0, 1), 0L), counts.getOrElse((g, 0, 0), 0L)))
    }.toMap
    val plan = equalizedOddsPlan(stats)

    // exact-count application via the salted relabel primitive: flip
    // round((1-a) * n1) of each group's yhat=1 rows to 0 and round(b * n0)
    // of its yhat=0 rows to 1 — seeded, no labels read at apply time, no
    // single-task-per-cell windows
    val n1: Map[Any, Long] = groups.map(g =>
      g -> (counts.getOrElse((g, 1, 1), 0L) + counts.getOrElse((g, 0, 1), 0L))).toMap
    val n0: Map[Any, Long] = groups.map(g =>
      g -> (counts.getOrElse((g, 1, 0), 0L) + counts.getOrElse((g, 0, 0), 0L))).toMap
    // the pred column may be any numeric type; cells are keyed by the
    // ORIGINAL column values observed in the data (already collected by
    // the single aggregation above)
    val predVals: Map[Int, Any] = cellRows.map(r => r.getInt(2) -> r.get(3)).toMap
    val byCell: Map[Seq[Any], Seq[(Any, Long)]] = groups.flatMap { g =>
      val (a, b) = plan.mix(g)
      val flip1 = n1(g) - math.round(a * n1(g)) // yhat=1 rows that BECOME 0
      val make1 = math.round(b * n0(g))         // yhat=0 rows that BECOME 1
      Seq(
        predVals.get(1).filter(_ => flip1 > 0).map(v1 =>
          Seq[Any](g, v1) -> Seq((predVals.getOrElse(0, 0): Any, flip1))),
        predVals.get(0).filter(_ => make1 > 0).map(v0 =>
          Seq[Any](g, v0) -> Seq((predVals.getOrElse(1, 1): Any, make1)))
      ).flatten
    }.toMap
    graft.core.ExactRelabel.relabel(predDF, Seq(groupCol, predCol), predCol, byCell, seed)
  }

  /** Reference-shaped surface: equalized odds across the `combined` group
    * column derived from a group condition (bug-compatible derivation, see
    * [[withCombined]]).
    */
  def blackboxEqOdds(
      predDF: DataFrame,
      groupCondition: Seq[(String, Any)],
      predCol: String,
      labelCol: String,
      seed: Long = 42L): DataFrame =
    equalizeOdds(withCombined(predDF, groupCondition), "combined", predCol, labelCol, seed)
}
