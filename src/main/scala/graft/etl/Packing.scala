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

  /** Per-GROUP inclusive running total of `valueCol` in `orderCols` order
    * within each `groupCols` key — the primitive behind per-source /
    * per-language token budgeting, where groups are FEW and HUGE (a
    * language holds a third of a 100 TB corpus): a plain
    * `Window.partitionBy(group)` would sort each group in one task. Here
    * the range split runs over (group, order) tuples, so one group spans
    * many ranges and every range cumsums in parallel; per-(group, range)
    * sums (tiny: |groups| x ranges rows) fold into driver offsets exactly
    * like [[withRunningTotal]].
    *
    * Contract: `groupCols` must be LOW-cardinality (driver holds
    * |groups| x ranges sums — sources, languages, shards; NOT user ids)
    * and NULL-free (the offset equi-join drops null keys). For
    * high-cardinality groups use the plain partitioned window: each
    * group is small, which is precisely when the window is already safe.
    * `orderCols` must total-order rows within a group.
    */
  def withGroupedRunningTotal(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: String,
      outCol: String,
      numPartitions: Int = 0,
      seed: Long = 42L): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty (use withRunningTotal)")
    val spark = df.sparkSession
    val sortCols = groupCols.map(col) ++ orderCols
    val (withPid, pidCol, _) = Ranking.withRangeId(df, sortCols, numPartitions, seed)
    val sums: Array[(Seq[Any], Int, Long)] = withPid
      .groupBy(groupCols.map(col) :+ col(pidCol): _*)
      .agg(sum(col(valueCol).cast("long")).as("__s"))
      .collect()
      .map(r => (groupCols.indices.map(r.get), r.getInt(groupCols.length),
        if (r.isNullAt(groupCols.length + 1)) 0L else r.getLong(groupCols.length + 1)))
    val offsetRows: Seq[org.apache.spark.sql.Row] = sums
      .groupBy(_._1).toSeq
      .flatMap { case (key, rows) =>
        var acc = 0L
        rows.sortBy(_._2).map { case (_, pid, s) =>
          val row = org.apache.spark.sql.Row.fromSeq(key ++ Seq[Any](pid, acc))
          acc += s
          row
        }
      }
    val keySchema = df.select(groupCols.map(col): _*).schema
    val offSchema = org.apache.spark.sql.types.StructType(
      keySchema.fields ++ Seq(
        org.apache.spark.sql.types.StructField(pidCol, org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("__graft_off", org.apache.spark.sql.types.LongType)))
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), offSchema)
    val w = Window.partitionBy((groupCols :+ pidCol).map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid
      .join(broadcast(offsets), groupCols :+ pidCol)
      .withColumn(outCol, sum(col(valueCol).cast("long")).over(w) + col("__graft_off"))
      .drop(pidCol, "__graft_off")
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
