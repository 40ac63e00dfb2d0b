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
      assert(r.getInt(2) > 0) // byte_len
      val b = r.getDouble(4)
      assert(b >= 0.0 && b <= 1.0) // brightness/level normalized
    }
  }

  test("real codecs: images decode as pgm, audio as wav, video falls to stub") {
    // decode once (byte-level PGM/WAV work per payload), filter locally
    val f = Multimodal.extractFeatures(media)
      .select("media_id", "kind", "codec", "width", "height", "sample_rate", "duration_ms")
      .collect()
    val byKind = f.map(r => (r.getString(1), r.getString(2))).toSet
    assert(byKind === Set(("image", "pgm"), ("audio", "wav"), ("video", "stub")))
    // decoded image dims equal the metadata dims
    val img = f.filter(_.getString(1) == "image")
      .map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    val meta = media.where(col("kind") === "image")
      .select(col("media_id"), col("meta.width"), col("meta.height")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(img === meta)
    // decoded wav sample rate and duration match the generator
    val aud = f.filter(_.getString(1) == "audio")
    assert(aud.nonEmpty)
    aud.foreach { r =>
      assert(r.getInt(5) === 8000)
      assert(r.getLong(6) >= 50 && r.getLong(6) <= 250)
    }
  }

  test("PGM golden decode: exact mean luminance of a hand-built image") {
    // 2x2 P5, maxval 255, pixels 0, 255, 100, 55 -> mean 102.5/255
    val payload = "P5\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, -1, 100, 55) // -1 == 0xFF
    val Some((w, h, lum, codec)) = Multimodal.decodePnm(payload)
    assert((w, h, codec) === ((2, 2, "pgm")))
    assert(math.abs(lum - (0 + 255 + 100 + 55) / 4.0 / 255.0) < 1e-12)
    // truncated pixel data is rejected, not misread
    assert(Multimodal.decodePnm(payload.dropRight(1)).isEmpty)
  }

  test("WAV golden decode: silence has rms 0, full-scale square has rms ~1") {
    val silence = Multimodal.wavBytes(8000, new Array[Byte](8000 * 2)) // 1s
    val Some((r1, d1, rms1)) = Multimodal.decodeWavPcm16(silence)
    assert(r1 === 8000 && d1 === 1000L && rms1 === 0.0)
    val data = new Array[Byte](1000 * 2)
    var i = 0
    while (i < 1000) { data(i * 2) = 0xFF.toByte; data(i * 2 + 1) = 0x7F.toByte; i += 1 }
    val Some((_, _, rms2)) = Multimodal.decodeWavPcm16(Multimodal.wavBytes(8000, data))
    assert(rms2 > 0.99 && rms2 <= 1.0)
  }

  test("WAV malformed negative chunk length is rejected, not an infinite loop") {
    // hand-build RIFF....WAVE + a chunk whose le32 length is -8: the old
    // chunk walk stopped advancing and spun forever on executor threads
    val b = new java.io.ByteArrayOutputStream()
    b.write("RIFF".getBytes("US-ASCII")); b.write(Array[Byte](36, 0, 0, 0))
    b.write("WAVE".getBytes("US-ASCII"))
    b.write("junk".getBytes("US-ASCII"))
    b.write(Array[Byte](-8, -1, -1, -1)) // length = -8 little-endian
    b.write(new Array[Byte](16))
    val done = new java.util.concurrent.CountDownLatch(1)
    @volatile var res: Option[Any] = Some("unset")
    val t = new Thread(() => { res = Multimodal.decodeWavPcm16(b.toByteArray); done.countDown() })
    t.setDaemon(true); t.start()
    assert(done.await(5, java.util.concurrent.TimeUnit.SECONDS), "decode hung on malformed RIFF")
    assert(res.isEmpty)
  }

  test("resizeImages: real nearest-neighbor resample, parse-back verified") {
    val resized = Multimodal.resizeImages(media, 4, 4)
    assert(resized.schema === media.schema)
    val feats = Multimodal.extractFeatures(resized).where(col("codec") === "pgm")
      .select("width", "height").collect()
    assert(feats.nonEmpty)
    feats.foreach { r => assert(r.getInt(0) === 4 && r.getInt(1) === 4) }
    // non-image payloads pass through untouched
    val audioBytes = resized.where(col("kind") === "audio")
      .select(length(col("payload"))).collect().map(_.getInt(0)).toSeq
    val origAudio = media.where(col("kind") === "audio")
      .select(length(col("payload"))).collect().map(_.getInt(0)).toSeq
    assert(audioBytes.sorted === origAudio.sorted)
    // constant-color image resizes to the same mean luminance
    val const = "P5\n3 3\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](9)(80)
    val Some(small) = Multimodal.resizePnmNearest(const, 2, 2)
    val Some((_, _, lum, _)) = Multimodal.decodePnm(small)
    assert(math.abs(lum - 80.0 / 255.0) < 1e-12)
  }

  private def fixtureBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    try in.readAllBytes() finally in.close()
  }

  test("ImageIO golden decode: committed PNG fixture with exact pixel values") {
    // 8x8 RGB gradient written at fixture-creation time: pixel(x,y) =
    // (r=x*32, g=y*32, b=128). PNG is lossless, so the mean luminance is
    // the analytic value exactly: (2*sum(x*32)*8 + 128*64) / (64*3*255).
    val Some((w, h, lum, codec)) = Multimodal.decodeImageIo(fixtureBytes("golden_8x8.png"))
    assert((w, h, codec) === ((8, 8, "png")))
    val expected = (2.0 * 896 * 8 + 128 * 64) / (64 * 3 * 255.0)
    assert(math.abs(lum - expected) < 1e-12)
  }

  test("ImageIO golden decode: committed JPEG fixture (lossy, toleranced + pinned)") {
    val Some((w, h, lum, codec)) = Multimodal.decodeImageIo(fixtureBytes("golden_8x8.jpg"))
    assert((w, h, codec) === ((8, 8, "jpeg")))
    // same gradient as the PNG; JPEG loss moves the mean only slightly
    assert(math.abs(lum - 0.46013) < 0.02)
  }

  test("ImageIO golden decode: BMP and GIF fixtures") {
    val Some((bw, bh, blum, bcodec)) = Multimodal.decodeImageIo(fixtureBytes("golden_64x32.bmp"))
    assert((bw, bh, bcodec) === ((64, 32, "bmp")))
    // 64x32: r=x*4, g=y*8, b=255-2x -> analytic mean
    val expected = ((4.0 * 2016 * 32) + (8.0 * 496 * 64) + (255.0 * 64 - 2 * 2016) * 32) /
      (64L * 32 * 3 * 255.0)
    assert(math.abs(blum - expected) < 1e-12)
    val Some((gw, gh, glum, gcodec)) = Multimodal.decodeImageIo(fixtureBytes("golden_64x32.gif"))
    assert((gw, gh, gcodec) === ((64, 32, "gif")))
    assert(math.abs(glum - expected) < 0.01) // palette quantization tolerance
  }

  test("ImageIO path is fail-soft: corrupt magic-matched bytes go to stub") {
    // valid JPEG magic, garbage body -> ImageIO fails -> None -> stub codec
    val corrupt = Array[Byte](0xFF.toByte, 0xD8.toByte) ++ Array.fill[Byte](64)(7)
    assert(Multimodal.decodeImageIo(corrupt) === None)
    val f = Multimodal.decode(99L, "image", corrupt, 0L)
    assert(f.codec === "stub")
    // and non-image binary is never even probed
    assert(Multimodal.decodeImageIo(Array.fill[Byte](32)(1)) === None)
  }

  test("decode dispatch routes compressed images through ImageIO end-to-end") {
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(1L, "image", "image/png", fixtureBytes("golden_8x8.png"), null),
      Row(2L, "image", "image/jpeg", fixtureBytes("golden_8x8.jpg"), null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(df)
      .select("media_id", "codec", "width", "height").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(feats(1L) === (("png", 8, 8)))
    assert(feats(2L) === (("jpeg", 8, 8)))
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
