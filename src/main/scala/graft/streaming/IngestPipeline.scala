package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.data.Warc
import graft.functions.TextFunctions

/** The web-ingestion front (WARC → HTML → quality gate) as ONE reusable
  * transform that runs identically over a batch frame or a Structured
  * Streaming frame.
  *
  * Why this composes with streaming for free: every stage is a STATELESS
  * compiled map stage — [[Warc.parseRecords]] (byte-walk kernel),
  * [[TextFunctions.htmlToText]] (codegen'd regexp chain),
  * [[TextFunctions.gopherFlags]] (single-pass counter kernel). No
  * watermark, no state store, no shuffle before the caller's own
  * aggregation; exactly-once delivery is carried entirely by the source's
  * offset log and the file sink's `_spark_metadata` commit log
  * (kill/restart and replayed-batch behavior proven in
  * `StreamingIngestSpec`, the ReplayIdempotenceSpec pattern).
  *
  * At 100 TB this is the shape you want: raw WARC blobs flow through a
  * pure map pipeline (filters run BEFORE anything shuffles), and the
  * gate drops failing documents while each blob's bytes are still local
  * to the task that read them.
  *
  * Batch twin: q91 runs this exact transform over the documents-derived
  * WARC blobs and is value-checked against a DuckDB replay (the q90
  * extraction CTEs composed with the q74 gate CTEs).
  */
object IngestPipeline {

  /** WARC response records → cleaned, gated documents.
    *
    * Input: `blobs` with a string/binary WARC column `blobCol` (one or
    * more concatenated records per cell); every other input column
    * passes through unchanged (ids, timestamps for downstream
    * watermarks, …).
    *
    * Output: passthrough columns + `target_uri`, `content_length`,
    * `clean` (extracted text), `n_tokens`, and `gate` (the full
    * [[TextFunctions.gopherFlags]] struct). With `requirePass=true`
    * only documents passing every Gopher rule survive; with `false`
    * the gate struct is kept for the caller to aggregate or filter
    * (the synthetic fixtures fail the stopword rule corpus-wide, so
    * q91 aggregates rather than filters).
    */
  def warcToCleanDocs(
      blobs: DataFrame,
      blobCol: String,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      requirePass: Boolean = true): DataFrame = {
    val parsed = blobs
      .select(col("*"), explode(Warc.parseRecords(col(blobCol))).as("_warc_rec"))
      .drop(blobCol)
      .where(col("_warc_rec.warc_type") === "response")
      .withColumn("clean", TextFunctions.htmlToText(col("_warc_rec.payload")))
      .withColumn("gate", TextFunctions.gopherFlags(col("clean"), minWords, maxWords))
      .withColumn("target_uri", col("_warc_rec.target_uri"))
      .withColumn("content_length", col("_warc_rec.content_length"))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("clean")))
      .drop("_warc_rec")
    if (requirePass) parsed.where(col("gate.pass")) else parsed
  }
}
