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
    // one pass: rank rows inside each (group, class) cell, apply the move
    // ranges [lo, hi) -> new class
    val w = Window.partitionBy(col(groupCol), col(predCol)).orderBy(rand(seed))
    val ranked = predDF.withColumn("__rn", row_number().over(w))
    var offset = Map.empty[(Any, Any), Long].withDefaultValue(0L)
    var relabel: org.apache.spark.sql.Column = col(predCol)
    moves.foreach { m =>
      val lo = offset((m.group, m.fromClass))
      val hi = lo + m.n
      relabel = when(
        col(groupCol) === lit(m.group) && col(predCol) === lit(m.fromClass) &&
          col("__rn") > lo && col("__rn") <= hi,
        lit(m.toClass)).otherwise(relabel)
      offset = offset.updated((m.group, m.fromClass), hi)
    }
    ranked.withColumn(predCol, relabel).drop("__rn")
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
}
