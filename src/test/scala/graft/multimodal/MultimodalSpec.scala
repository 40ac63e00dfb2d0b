package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthetic(spark, 50, seed = 7).cache()

  test("synthetic media table matches the declared schema") {
    assert(media.schema === Multimodal.mediaSchema)
    assert(media.count() === 50)
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("extractFeatures: one feature row per media row, deterministic") {
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.length === 50)
    assert(f1.map(_.toString).toSeq === f2.map(_.toString).toSeq)
    f1.foreach { r =>
      assert(r.getInt(2) >= 64 && r.getInt(2) < 256) // byte_len
      val b = r.getDouble(4)
      assert(b >= 0.0 && b <= 1.0) // brightness normalized
    }
  }

  test("feature table carries no binary column (shuffle-safe)") {
    val f = Multimodal.extractFeatures(media)
    assert(!f.schema.fields.exists(_.dataType == org.apache.spark.sql.types.BinaryType))
  }

  test("planFrameSamples fans out (media_id, frame_ms) without touching payloads") {
    val plan = Multimodal.planFrameSamples(media, everyMs = 1000)
    val perVideo = plan.groupBy("media_id").count().collect()
    assert(perVideo.nonEmpty)
    // every video with duration d gets floor(d/1000)+1 frames
    val durs = media.where(col("kind") === "video")
      .select("media_id", "meta.duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    perVideo.foreach { r =>
      assert(r.getLong(1) === durs(r.getLong(0)) / 1000 + 1)
    }
  }

  test("metadataOnly prunes the payload from the scan") {
    val meta = Multimodal.metadataOnly(media)
    assert(!meta.columns.contains("payload"))
    assert(meta.count() === 50)
  }
}
