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
    *
    * `shardsPerPartition` > 1 spreads each partition VALUE over that many
    * writer tasks (deterministic hash of `orderCols`, so shard assignment
    * is stable across retries): with the default 1, a partition value that
    * holds half the corpus funnels through one task — `maxRecordsPerFile`
    * would roll its files but serially. The salt column never reaches the
    * output schema; per-file ordering is preserved because the sort runs
    * after the salted repartition.
    */
  def writeSharded(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      maxRecordsPerFile: Int,
      shardsPerPartition: Int = 1,
      numWriters: Int = 0): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    ShardedWrite.run(df, path, partitionCols, orderCols, maxRecordsPerFile,
      shardsPerPartition, numWriters, "parquet")
  }
}

/** The ONE implementation of the sharded-layout contract (salted
  * repartition-before-partitionBy, per-file order, bounded file sizes) —
  * [[Export]] binds it to parquet, [[JsonLines]] to JSONL. Kept single so
  * the subtle parts (salt never reaching the output schema, AQE-proof
  * explicit writer counts, the empty-partitionCols parallelism rule)
  * cannot drift between formats.
  */
private[data] object ShardedWrite {

  def run(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      maxRecordsPerFile: Int,
      shardsPerPartition: Int,
      numWriters: Int,
      format: String): Unit = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    require(shardsPerPartition > 0, "shardsPerPartition must be positive")
    // no partition columns AND no sharding requested: a salted repartition
    // would be pmod(hash, 1) = one constant key = ONE writer task for the
    // whole dataset — keep the upstream partitioning (or the caller's
    // explicit writer count) instead; maxRecordsPerFile still bounds files
    val partitioned =
      if (partitionCols.isEmpty && shardsPerPartition == 1) {
        if (numWriters > 0) df.repartition(numWriters) else df
      } else {
        val salt = "__graft_shard"
        val salted = df.withColumn(salt,
          pmod(xxhash64(orderCols: _*), lit(shardsPerPartition)))
        // explicit numWriters pins the writer-task count (AQE coalescing
        // would otherwise merge small shuffle partitions back together —
        // right for queries, wrong when the goal IS parallel writers /
        // bounded files)
        val keys = (partitionCols :+ salt).map(col)
        (if (numWriters > 0) salted.repartition(numWriters, keys: _*)
         else salted.repartition(keys: _*))
      }
    val writer = partitioned
      .sortWithinPartitions(partitionCols.map(col) ++ orderCols: _*)
      .drop("__graft_shard")
      .write
      .format(format)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .save(path)
  }
}
