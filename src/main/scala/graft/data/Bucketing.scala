package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle a fact table ONCE at write time so
  * every later equi-join or aggregation on the bucket key runs without an
  * exchange — the standard way to amortize the dominant shuffle of a
  * repeatedly-joined 100 TB table across all downstream queries.
  *
  * Both join sides bucketed into the same `numBuckets` on the join key =>
  * Catalyst plans a SortMergeJoin with NO Exchange on either side (the
  * `BucketingSpec` asserts that on the physical plan). Sorting within
  * buckets at write time also drops the per-query sort when
  * `spark.sql.legacy.bucketedTableScan.outputOrdering` is honored.
  */
object Bucketing {

  /** Write `df` as a bucketed, optionally bucket-sorted parquet table in
    * the session catalog.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    require(bucketCols.nonEmpty && numBuckets > 0)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** True when the physical plan of `df` contains a shuffle exchange —
    * the thing bucketing exists to remove.
    */
  def hasShuffleExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Join two same-bucketed tables on the bucket key. Plain `join` — the
    * point is what Catalyst does NOT add (no exchange on either side).
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      on: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on)
}
