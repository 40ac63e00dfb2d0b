package graft.data

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Newline-delimited JSON (JSONL) source/sink — the lingua franca of LLM
  * training-data interchange (every public corpus release, tokenizer
  * pipeline, and eval harness speaks it). Parquet stays the internal
  * format; JSONL is the boundary format, and the boundary is where scale
  * mistakes happen:
  *
  *  - **schema inference is a full extra scan.** `spark.read.json(path)`
  *    without a schema reads ALL the data once just to guess types — at
  *    100 TB that doubles ingest cost and can still guess wrong on
  *    sparse fields (a column that is null for the first billion rows).
  *    [[read]] therefore REQUIRES an explicit schema; there is no
  *    inference overload on purpose.
  *  - **one bad line must not kill a 10-hour job — or vanish silently.**
  *    [[read]] runs PERMISSIVE with a caller-named corrupt-record column,
  *    so malformed lines surface as auditable rows (count them, quarantine
  *    them, alert on rate) instead of either crashing (FAILFAST) or being
  *    silently dropped (DROPMALFORMED). [[readStrict]] is the opt-in
  *    fail-loud variant for contracts where corruption means stop.
  *  - **the write side inherits every file-layout failure mode of
  *    [[Export.writeSharded]]** (small-files explosion, unbounded hot
  *    shards, unordered rows) — [[writeSharded]] is the same
  *    repartition-before-partitionBy / maxRecordsPerFile / in-file-order
  *    design with a JSONL serializer, so a corpus export hands tokenizer
  *    workers line-seekable, size-bounded, id-ordered shards.
  */
object JsonLines {

  /** Read JSONL at `path` with the given EXPLICIT schema. Malformed lines
    * land in `corruptCol` (the raw line text, other columns null); well-
    * formed lines have `corruptCol` null. The corrupt column is appended
    * to the caller's schema — callers filter or count it, then drop it.
    *
    * Spark quirk: a query whose ONLY referenced column is the corrupt
    * column (e.g. `read(...).where(corrupt.isNotNull).count()`) is
    * rejected by the JSON source (`UNSUPPORTED_FEATURE.QUERY_ONLY_
    * CORRUPT_RECORD_COLUMN`) because column pruning would skip the very
    * parse that populates it — `.cache()` the frame first for audit-only
    * counts; any query that also touches a data column is unaffected.
    */
  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      corruptCol: String = "_corrupt_line"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already contains corrupt-record column '$corruptCol'")
    spark.read
      .schema(schema.add(StructField(corruptCol, StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** FAILFAST JSONL read — any malformed line aborts the job. */
  def readStrict(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Write `df` under `path` as JSONL, partitioned by `partitionCols`
    * (optional), files rolled at `maxRecordsPerFile` rows, rows inside
    * every file ordered by `orderCols`. Shares [[ShardedWrite]] with
    * [[Export.writeSharded]] — one implementation of the layout contract.
    * With no partition columns and the default `shardsPerPartition = 1`
    * the input partitioning is kept (a salted repartition would funnel
    * everything through one writer); pass `shardsPerPartition > 1` or
    * `numWriters` to pin an explicit shard/writer count.
    */
  def writeSharded(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      maxRecordsPerFile: Int,
      shardsPerPartition: Int = 1,
      numWriters: Int = 0): Unit =
    ShardedWrite.run(df, path, partitionCols, orderCols, maxRecordsPerFile,
      shardsPerPartition, numWriters, "json")
}
