package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ranking: the distributed replacement for
  * `Window.orderBy(...)` with no partition spec, which funnels every row
  * through a single task ("No Partition Defined" warning — the one true
  * scale-killer plan flagged in round 1's q07).
  *
  * Plan (TeraSort-with-explicit-boundaries), three jobs total:
  *   1. draw a bounded deterministic sample of the sort keys — TakeOrdered
  *      on a seeded xxhash64, NOT `df.sample` — sort it on the driver and
  *      take `numPartitions - 1` split points;
  *   2. assign each row a range id by comparing its key tuple against the
  *      split-point literals (codegen'd when-ladder, no shuffle); per-range
  *      counts -> cumulative offsets on the driver (tiny; the row total
  *      falls out for free);
  *   3. global rank = offset + row_number over a window PARTITIONED by the
  *      range id — one hash shuffle of the data, every stage parallel.
  *
  * Why not `repartitionByRange` + `spark_partition_id`: RangePartitioner
  * seeds its reservoir sampling with the RDD id, which changes on every
  * action, so two jobs over the same DataFrame see DIFFERENT partition
  * boundaries — offsets computed in one job are wrong in the next. Data-
  * derived boundary literals make the range id a pure function of the row.
  *
  * Sort keys must be non-null; include a tiebreaker column to make the
  * order total, or equal tuples receive arbitrary relative ranks.
  */
object Ranking {

  // boundary-sample size: ~128 samples per split point at 32 partitions is
  // plenty for balance, and keeps the TakeOrdered driver merge
  // (numPartitions * cap rows) trivial
  private val SampleCap = 4096L

  /** `a > b` lexicographically over the key tuple. */
  private def tupleGt(cols: Seq[Column], bound: Seq[Any]): Column =
    cols.zip(bound).foldRight(lit(false)) { case ((c, b), rest) =>
      c > lit(b) || (c === lit(b) && rest)
    }

  /** Append a 1-based dense global row number ordered by `sortCols`. */
  def withGlobalRowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      outCol: String,
      numPartitions: Int = 0,
      seed: Long = 42L): DataFrame =
    rankedWithTotal(df, sortCols, outCol, numPartitions, seed)._1

  /** SQL `ntile(k)` over a global order, computed from the scalable global
    * row number instead of a single-partition window: the first `n mod k`
    * buckets take `ceil(n/k)` rows, the rest `floor(n/k)` (exact ntile
    * semantics).
    */
  def withNtile(
      df: DataFrame,
      sortCols: Seq[Column],
      k: Int,
      outCol: String,
      numPartitions: Int = 0,
      seed: Long = 42L): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    val rnCol = "__graft_global_rn"
    val (ranked, total) = rankedWithTotal(df, sortCols, rnCol, numPartitions, seed)
    if (total == 0) return ranked.withColumn(outCol, lit(null).cast("int")).drop(rnCol)
    val base = total / k
    val rem = total % k
    val r0 = col(rnCol) - 1
    val bucket =
      if (base == 0) r0 + 1 // fewer rows than buckets: one row per bucket
      else when(r0 < rem * (base + 1), floor(r0 / (base + 1)) + 1)
        .otherwise(lit(rem) + floor((r0 - rem * (base + 1)) / base) + 1)
    ranked.withColumn(outCol, bucket.cast("int")).drop(rnCol)
  }

  /** SQL `ntile(k) OVER (PARTITION BY groupCols ORDER BY sortCols)`
    * without a per-group window: groups are contiguous in the global
    * (groupCols ++ sortCols) order, so one scalable global row number +
    * a tiny per-group (min-rank, count) broadcast join recovers the
    * 0-based within-group rank, and the exact NTILE arithmetic (first
    * n mod k buckets take one extra row) is plain column math. A
    * partitionBy(group) window would put every group in ONE task —
    * skew-prone for few-large-group shapes like per-language corpora;
    * this stays range-split regardless of group sizes. Requires the
    * number of DISTINCT groups to be broadcast-small (the per-group
    * extent frame has one row per group).
    *
    * NULL group keys form their own partition, matching the window
    * `ntile(k) OVER (PARTITION BY g)` semantics: null-keyed rows always
    * fall in range 0 of the global rank (every bound comparison is
    * null -> false) and the range window orders nulls first, so the
    * null group is contiguous like any other; the extent join-back is
    * null-safe (`<=>`) so those rows are bucketed, not dropped.
    */
  def withGroupedNtile(
      df: DataFrame,
      groupCols: Seq[String],
      sortCols: Seq[Column],
      k: Int,
      outCol: String,
      numPartitions: Int = 0,
      seed: Long = 42L): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    require(groupCols.nonEmpty, "at least one group column required")
    val rnCol = "__graft_global_rn"
    val ranked = withGlobalRowNumber(df,
      groupCols.map(col) ++ sortCols, rnCol, numPartitions, seed)
    val jk = groupCols.indices.map(i => s"__gjk_$i")
    val ext = ranked.groupBy(groupCols.map(col): _*)
      .agg(min(col(rnCol)).as("__g0"), count(lit(1)).as("__gn"))
      .select(groupCols.zip(jk).map { case (g, j) => col(g).as(j) } :+
        col("__g0") :+ col("__gn"): _*)
    val cond = groupCols.zip(jk)
      .map { case (g, j) => ranked(g) <=> ext(j) }
      .reduce(_ && _)
    val joined = ranked.join(broadcast(ext), cond).drop(jk: _*)
    val r0 = col(rnCol) - col("__g0") // 0-based within-group rank
    val n = col("__gn")
    val rem = n % k
    val base = (n - rem) / k // exact: numerator divisible by k
    val bucket = when(base === 0, r0 + 1) // fewer rows than buckets
      .when(r0 < rem * (base + 1), floor(r0 / (base + 1)) + 1)
      .otherwise(rem + floor((r0 - rem * (base + 1)) / base) + 1)
    joined.withColumn(outCol, bucket.cast("int"))
      .drop(rnCol, "__g0", "__gn")
  }

  /** Assign each row a data-derived RANGE id in `sortCols` order: 0-based,
    * at most `numPartitions` ranges, a pure function of the row (stable
    * across jobs — see the class doc for why `repartitionByRange` is not).
    * Shared machinery for global ranks (here), exact order statistics
    * ([[GroupPercentiles]]) and running totals ([[Packing]]). Returns the
    * annotated frame, the range-id column name, and the range count.
    */
  private[etl] def withRangeId(
      df: DataFrame,
      sortCols: Seq[Column],
      numPartitions: Int,
      seed: Long): (DataFrame, String, Int) = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keyStruct = struct(sortCols: _*)

    // Deterministic bounded key sample: the SampleCap keys with the smallest
    // seeded hash (TakeOrdered — per-partition top-k, tiny driver merge).
    // No count pass needed, and the same rows are picked in every job.
    // Sample quality only affects BALANCE, never correctness of the rank.
    val sample: Array[Row] = df
      .select((sortCols :+ xxhash64(keyStruct, lit(seed)).as("__graft_h")): _*)
      .orderBy(col("__graft_h")).limit(SampleCap.toInt)
      .drop("__graft_h")
      .collect()
    implicit val ord: Ordering[AnyComparable] = anyComparableOrdering
    val sortedKeys: Array[Seq[Any]] = sample
      .map(r => (0 until r.length).map(r.get): Seq[Any])
      .sortBy(k => k.map(AnyComparable(_)): Seq[AnyComparable])(
        math.Ordering.Implicits.seqOrdering[Seq, AnyComparable])
    val parts = math.max(1, math.min(n, sortedKeys.length + 1))
    val bounds: Seq[Seq[Any]] =
      (1 until parts).map(i => sortedKeys((i.toLong * sortedKeys.length / parts).toInt))

    val pidCol = "__graft_range_pid"
    // range id = number of split points strictly below this key
    val pidExpr = bounds.foldLeft(lit(0)) { (e, b) =>
      e + when(tupleGt(sortCols, b), 1).otherwise(0)
    }
    (df.withColumn(pidCol, pidExpr), pidCol, parts)
  }

  private def rankedWithTotal(
      df: DataFrame,
      sortCols: Seq[Column],
      outCol: String,
      numPartitions: Int,
      seed: Long): (DataFrame, Long) = {
    val (withPid, pidCol, parts) = withRangeId(df, sortCols, numPartitions, seed)

    val counts = withPid.groupBy(col(pidCol)).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    if (total == 0) return (df.withColumn(outCol, lit(null).cast("long")), 0L)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until parts).map { p =>
        val o = p -> acc; acc += counts.getOrElse(p, 0L); o
      }.toMap
    }
    val offsetExpr = offsets.foldLeft(lit(0L)) { case (e, (p, o)) =>
      when(col(pidCol) === p, lit(o)).otherwise(e)
    }
    val ranked = withPid
      .withColumn(outCol,
        row_number().over(Window.partitionBy(col(pidCol)).orderBy(sortCols: _*)).cast("long")
          + offsetExpr)
      .drop(pidCol)
    (ranked, total)
  }

  /** Driver-side ordering for sampled key values (numbers, strings, dates) —
    * must agree with Spark's ascending column ordering on the same types.
    */
  private final case class AnyComparable(v: Any)
  private val anyComparableOrdering: Ordering[AnyComparable] = new Ordering[AnyComparable] {
    def compare(a: AnyComparable, b: AnyComparable): Int = (a.v, b.v) match {
      case (x: java.lang.Double, y: java.lang.Double) => java.lang.Double.compare(x, y)
      case (x: java.lang.Float, y: java.lang.Float) => java.lang.Float.compare(x, y)
      case (x: Number, y: Number) => java.lang.Long.compare(x.longValue(), y.longValue())
      case (x: String, y: String) => x.compareTo(y)
      case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
      case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
      case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
      case (x, y) => String.valueOf(x).compareTo(String.valueOf(y))
    }
  }
}
