package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sharded training-data export — the write side of a 100 TB pipeline,
  * where the failure modes are all about FILES, not rows:
  *
  *  - **small-files explosion**: `write.partitionBy(p)` WITHOUT
  *    pre-partitioning lets every task own rows of every partition value,
  *    producing tasks x partitions files (thousands of tiny parquet
  *    footers that throttle the next job's planning). Repartitioning on
  *    the partition columns first makes each output directory the work of
  *    the tasks that own that key — file count follows data volume.
  *  - **unbounded file sizes**: one hot partition value would otherwise
  *    become one giant file (one downstream task); `maxRecordsPerFile`
  *    rolls files so downstream parallelism survives skew.
  *  - **intra-file order**: rows sorted inside each file (after the
  *    repartition, so the sort is per output shard) give downstream
  *    readers monotone id/timestamp runs — min/max footer stats become
  *    selective, and sequence packing reads contiguous docs.
  */
object Export {

  /** Write `df` under `path` as parquet partitioned by `partitionCols`,
    * each file at most `maxRecordsPerFile` rows, rows inside every file
    * ordered by `orderCols`.
    */
  def writeSharded(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      maxRecordsPerFile: Int): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(partitionCols.map(col) ++ orderCols: _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .mode("overwrite")
      .parquet(path)
  }
}
