package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as opaque `binary` columns with typed metadata
  * structs; decode / feature-extract / resize / frame-sample run as
  * batched partition-local transforms.
  *
  * The Spark-side plumbing — schemas, partition sizing, batch iteration,
  * row reassembly — is real and tested. The codec step itself is a
  * clearly-marked deterministic STUB (`StubCodec`): the actual image/audio
  * libraries are not in this container; swapping in a real decoder is a
  * one-function change with the same `Array[Byte] => MediaFeatures`
  * signature.
  *
  * Scale notes: binary payloads never enter a shuffle here — all transforms
  * are narrow (mapPartitions); metadata-only projections prune the binary
  * column at the parquet scan when downstream stages don't need bytes.
  */
object Multimodal {

  /** Typed metadata accompanying every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sample_rate", IntegerType))))))

  /** Decoded per-item features (the decode step's output contract). */
  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      byteLen: Int,
      contentHash: Long,
      brightness: Double, // image proxy
      durationMs: Long)   // audio/video proxy

  /** STUB codec — deterministic fake standing in for the real decoder
    * (image libs absent in this environment). Real implementation replaces
    * ONLY this object; the pipeline signature stays `Array[Byte] =>
    * MediaFeatures`-shaped.
    */
  object StubCodec {
    /** ??? in spirit: a real decoder parses the payload; the stub derives
      * deterministic pseudo-features from the bytes so plumbing (schema,
      * batching, determinism) is testable end-to-end.
      */
    def decode(mediaId: Long, kind: String, payload: Array[Byte], durationMs: Long): MediaFeatures = {
      var h = 0L
      var i = 0
      while (i < payload.length) { h = h * 31 + (payload(i) & 0xFF); i += 1 }
      val brightness = if (payload.isEmpty) 0.0 else {
        var s = 0L
        var j = 0
        while (j < payload.length) { s += (payload(j) & 0xFF); j += 1 }
        s.toDouble / payload.length / 255.0
      }
      MediaFeatures(mediaId, kind, payload.length, h, brightness, durationMs)
    }
  }

  /** Batched decode: mapPartitions over (media_id, kind, payload, meta) —
    * one codec call per row, no per-row task overhead, binary stays
    * partition-local. Returns the features table (no payload column: the
    * result is shuffle-safe).
    */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("byte_len", IntegerType),
      StructField("content_hash", LongType),
      StructField("brightness", DoubleType),
      StructField("duration_ms", LongType)))
    val idI = df.columns.indexOf("media_id")
    val kindI = df.columns.indexOf("kind")
    val payI = df.columns.indexOf("payload")
    val metaI = df.columns.indexOf("meta")
    require(idI >= 0 && kindI >= 0 && payI >= 0, "expected media_id, kind, payload columns")
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val payload = if (r.isNullAt(payI)) Array.empty[Byte] else r.getAs[Array[Byte]](payI)
        val dur = if (metaI >= 0 && !r.isNullAt(metaI)) {
          val m = r.getStruct(metaI)
          if (m.isNullAt(2)) 0L else m.getLong(2)
        } else 0L
        val f = StubCodec.decode(r.getLong(idI), r.getString(kindI), payload, dur)
        Row(f.mediaId, f.kind, f.byteLen, f.contentHash, f.brightness, f.durationMs)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling plan for video rows: one output row per sampled frame
    * timestamp (every `everyMs` within duration) — pure Column math
    * (sequence + explode), no decode needed to PLAN the sampling; the
    * decode of each frame happens downstream on the (media_id, frame_ms)
    * work list. This is the shape that lets a 100 TB video corpus fan out
    * frame work without shuffling payloads.
    */
  def planFrameSamples(df: DataFrame, everyMs: Long): DataFrame =
    df.where(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), coalesce(col("meta.duration_ms"), lit(0L)), lit(everyMs)))
          .as("frame_ms"))

  /** Metadata-only projection — binary column pruned at scan. */
  def metadataOnly(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("kind"), col("mime"),
      col("meta.width"), col("meta.height"), col("meta.duration_ms"), col("meta.sample_rate"))

  /** Synthesize a deterministic media table for tests/benchmarks. */
  def synthetic(spark: org.apache.spark.sql.SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val kinds = Seq("image", "audio", "video")
    val rows = spark.range(n).rdd.map { id =>
      val rng = new scala.util.Random(seed + id)
      val kind = kinds(rng.nextInt(3))
      val payload = new Array[Byte](64 + rng.nextInt(192))
      rng.nextBytes(payload)
      Row(id, kind, s"$kind/x-test", payload,
        Row(if (kind == "image") 640 else null,
          if (kind == "image") 480 else null,
          if (kind != "image") 1000L + rng.nextInt(9000) else null,
          if (kind == "audio") 16000 else null))
    }
    spark.createDataFrame(rows, mediaSchema)
  }
}
