package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data export: concatenate documents in
  * a stable order and chunk the stream into fixed token budgets — the
  * standard "concat and split every `budget` tokens" packing, expressed as
  * a scale-safe assignment `seq_id = floor(tokens_before / budget)` so it
  * needs a global RUNNING TOTAL, not a loop.
  *
  * The running total reuses [[Ranking]]'s data-derived range split: range
  * id per row (pure function of the sort key), per-range sums -> driver
  * cumulative offsets (tiny), then one windowed cumsum PARTITIONED by
  * range id — every stage parallel, no single-partition window, identical
  * results across jobs. Two bounded jobs + the final pass.
  *
  * Contract: `orderCols` must be a total order (include a unique
  * tiebreaker) — ties would make the cumsum order, and therefore sequence
  * boundaries, nondeterministic.
  */
object Packing {

  /** Inclusive global running total of `valueCol` in `orderCols` order. */
  def withRunningTotal(
      df: DataFrame,
      orderCols: Seq[Column],
      valueCol: String,
      outCol: String,
      numPartitions: Int = 0,
      seed: Long = 42L): DataFrame = {
    val (withPid, pidCol, parts) = Ranking.withRangeId(df, orderCols, numPartitions, seed)
    val sums: Map[Int, Long] = withPid
      .groupBy(col(pidCol)).agg(sum(col(valueCol).cast("long")).as("__s"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until parts).map { p =>
        val o = p -> acc; acc += sums.getOrElse(p, 0L); o
      }.toMap
    }
    val offsetExpr = offsets.foldLeft(lit(0L)) { case (e, (p, o)) =>
      when(col(pidCol) === p, lit(o)).otherwise(e)
    }
    val w = Window.partitionBy(col(pidCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid
      .withColumn(outCol, sum(col(valueCol).cast("long")).over(w) + offsetExpr)
      .drop(pidCol)
  }

  /** Assign each document its training-sequence id under `budget`:
    * `floor(weight_before / budget)` with weight_before = running total
    * minus the row's own weight. Documents are never split; a document
    * whose weight straddles a boundary belongs to the sequence it starts
    * in (the downstream tokenizer pads or truncates — chunk-level
    * semantics match the usual concat-then-chunk export).
    */
  def assignSequences(
      df: DataFrame,
      orderCols: Seq[Column],
      weightCol: String,
      budget: Long,
      outCol: String = "seq_id",
      numPartitions: Int = 0,
      seed: Long = 42L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val rt = "__graft_running"
    withRunningTotal(df, orderCols, weightCol, rt, numPartitions, seed)
      .withColumn(outCol,
        floor((col(rt) - col(weightCol).cast("long")) / lit(budget.toDouble)))
      .drop(rt)
  }
}
