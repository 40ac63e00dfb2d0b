package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as opaque `binary` columns with typed metadata
  * structs; decode / feature-extract / resize / frame-sample run as
  * batched partition-local transforms.
  *
  * The codec is REAL wherever the base JDK can decode:
  *  - PGM/PPM (netpbm P5/P6) via the hand-rolled parser (pixel stats +
  *    nearest-neighbor resize);
  *  - PCM-16 WAV via the RIFF walker (sample rate, true duration, RMS);
  *  - JPEG/PNG/GIF/BMP/TIFF via `javax.imageio.ImageIO`, which ships in
  *    the base JDK ([[decodeImageIo]] — real pixel luminance, magic-byte
  *    sniffed, corrupt payloads fall soft to the stub path).
  * Only formats with NO JDK codec (MP3/MP4/WebM …) fall back to the
  * clearly-marked deterministic [[StubCodec]]; swapping in a real decoder
  * is a one-function change with the same `Array[Byte] => MediaFeatures`
  * signature.
  *
  * Scale notes: binary payloads never enter a shuffle here — all transforms
  * are narrow (mapPartitions); metadata-only projections prune the binary
  * column at the parquet scan when downstream stages don't need bytes.
  */
object Multimodal {

  // No temp-file stream cache for in-memory payload decodes — see the
  // rationale in [[ImageHash]] (JVM-global; set in both objects so
  // whichever decode surface is touched first applies it).
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Decoded per-item features (the decode step's output contract).
    * `brightness` is mean luminance / maxval for images and normalized RMS
    * level for audio; `width`/`height`/`sampleRate` are -1 when the format
    * doesn't carry them.
    */
  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      byteLen: Int,
      contentHash: Long,
      brightness: Double,
      durationMs: Long,
      width: Int,
      height: Int,
      sampleRate: Int,
      codec: String) // pgm | ppm | wav | stub

  // ------------------------------------------------------------------
  // Real pure-JVM codecs for uncompressed formats
  // ------------------------------------------------------------------

  /** netpbm binary formats: P5 (gray) / P6 (rgb). Returns
    * (width, height, maxval, pixel offset) or null header on parse failure.
    */
  private final case class PnmHeader(magic: Char, w: Int, h: Int, maxval: Int, offset: Int)

  private def parsePnmHeader(b: Array[Byte]): Option[PnmHeader] = {
    if (b.length < 10 || b(0) != 'P' || (b(1) != '5' && b(1) != '6')) return None
    var i = 2
    def skipWs(): Boolean = {
      var progressed = false
      var looping = true
      while (looping && i < b.length) {
        val c = b(i).toChar
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1; progressed = true }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') { i += 1; progressed = true }
        else looping = false
      }
      progressed
    }
    def readInt(): Int = {
      var v = 0
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1; any = true }
      if (any) v else -1
    }
    if (!skipWs()) return None
    val w = readInt(); if (w <= 0) return None
    if (!skipWs()) return None
    val h = readInt(); if (h <= 0) return None
    if (!skipWs()) return None
    val mv = readInt(); if (mv <= 0 || mv > 255) return None
    // exactly one whitespace byte after maxval, then raw pixels
    if (i >= b.length) return None
    i += 1
    Some(PnmHeader(b(1).toChar, w, h, mv, i))
  }

  /** Header fields for [[ImageHash]]'s pixel-level decode:
    * (magic, w, h, maxval, pixel offset).
    */
  private[multimodal] def pnmHeaderFor(b: Array[Byte]): Option[(Char, Int, Int, Int, Int)] =
    parsePnmHeader(b).map(h => (h.magic, h.w, h.h, h.maxval, h.offset))

  /** Mean luminance in [0, 1] of a P5/P6 payload; None if not PNM or
    * truncated.
    */
  def decodePnm(b: Array[Byte]): Option[(Int, Int, Double, String)] =
    parsePnmHeader(b).flatMap { hd =>
      val channels = if (hd.magic == '5') 1 else 3
      val need = hd.w.toLong * hd.h * channels
      if (b.length - hd.offset < need) None
      else {
        var s = 0L
        var i = hd.offset
        val end = hd.offset + need.toInt
        while (i < end) { s += (b(i) & 0xFF); i += 1 }
        Some((hd.w, hd.h, s.toDouble / need / hd.maxval,
          if (hd.magic == '5') "pgm" else "ppm"))
      }
    }

  /** PCM-16 mono/stereo RIFF WAV: (sampleRate, durationMs, normalized RMS).
    */
  def decodeWavPcm16(b: Array[Byte]): Option[(Int, Long, Double)] = {
    def le32(o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    def le16(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var o = 12
    var rate = -1
    var channels = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (o + 8 <= b.length && (rate < 0 || dataOff < 0)) {
      val id = new String(b, o, 4, "US-ASCII")
      val len = le32(o + 4)
      if (id == "fmt " && o + 8 + 16 <= b.length) {
        val fmt = le16(o + 8)
        channels = le16(o + 10)
        rate = le32(o + 12)
        bits = le16(o + 22)
        if (fmt != 1 || bits != 16 || channels <= 0) return None
      } else if (id == "data") {
        dataOff = o + 8
        dataLen = math.min(len, b.length - dataOff)
      }
      // malformed guard: a negative chunk length would stop the offset
      // advancing (or walk it backwards) and spin this loop forever on a
      // corrupt/adversarial RIFF payload — an executor hang, not a skip.
      // The advance is computed in LONG: a large positive len (e.g.
      // 0x7FFFFFF0) would overflow Int and land a negative offset in the
      // next new String(...), throwing instead of skipping the row.
      if (len < 0) return None
      val next = o.toLong + 8L + len.toLong + (len & 1)
      // a truncated final chunk ends the walk; the checks below decide
      // whether what was already parsed (fmt + clamped data) suffices
      o = if (next > b.length) b.length else next.toInt
    }
    if (rate <= 0 || dataOff < 0 || dataLen < 2) return None
    val nSamples = dataLen / 2
    var i = dataOff
    var sumSq = 0.0
    while (i + 1 < dataOff + dataLen) {
      val s = ((b(i) & 0xFF) | (b(i + 1) << 8)).toShort.toDouble
      sumSq += s * s
      i += 2
    }
    val rms = math.sqrt(sumSq / nSamples) / 32768.0
    val frames = nSamples / channels
    Some((rate, frames.toLong * 1000 / rate, rms))
  }

  /** Magic-byte sniff for the compressed image formats the base JDK's
    * ImageIO decodes. Sniffing BEFORE handing bytes to ImageIO keeps
    * arbitrary binary (video payloads, garbage) off the expensive
    * reader-probe path.
    */
  private def sniffImageFormat(b: Array[Byte]): Option[String] = {
    if (b.length < 8) None
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) Some("jpeg")
    else if ((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') Some("png")
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("gif")
    else if (b(0) == 'B' && b(1) == 'M') Some("bmp")
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) Some("tiff")
    else None
  }

  /** REAL compressed-image decode via the base JDK's `javax.imageio`
    * (JPEG/PNG/GIF/BMP/TIFF readers ship with every JDK — no external
    * libraries involved): (width, height, mean RGB luminance in [0,1],
    * codec). Brightness matches the PPM convention — mean over all
    * R,G,B samples / 255. None when the magic doesn't match a JDK
    * format or the payload is corrupt (fail-soft: the row then takes
    * the stub path rather than killing the task).
    */
  def decodeImageIo(b: Array[Byte]): Option[(Int, Int, Double, String)] =
    sniffImageFormat(b).flatMap { fmt =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          if (w <= 0 || h <= 0) None
          else {
            var s = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                s += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            Some((w, h, s.toDouble / (w.toLong * h * 3) / 255.0, fmt))
          }
        }
      } catch { case _: Exception => None }
    }

  /** STUB codec — deterministic fake for formats with NO base-JDK codec
    * (MP3/MP4/WebM and friends). A real decoder replaces ONLY this
    * object.
    */
  object StubCodec {
    def decode(mediaId: Long, kind: String, payload: Array[Byte], durationMs: Long): MediaFeatures = {
      val brightness = if (payload.isEmpty) 0.0 else {
        var s = 0L
        var j = 0
        while (j < payload.length) { s += (payload(j) & 0xFF); j += 1 }
        s.toDouble / payload.length / 255.0
      }
      MediaFeatures(mediaId, kind, payload.length, contentHash(payload), brightness,
        durationMs, -1, -1, -1, "stub")
    }
  }

  private def contentHash(payload: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xFF); i += 1 }
    h
  }

  /** Format-dispatching decode: real PNM/WAV parsing, real ImageIO
    * decode for JPEG/PNG/GIF/BMP/TIFF, stub only for formats the JDK
    * genuinely cannot decode.
    */
  def decode(mediaId: Long, kind: String, payload: Array[Byte], metaDurationMs: Long): MediaFeatures =
    decodePnm(payload) match {
      case Some((w, h, lum, codec)) =>
        MediaFeatures(mediaId, kind, payload.length, contentHash(payload), lum,
          metaDurationMs, w, h, -1, codec)
      case None => decodeWavPcm16(payload) match {
        case Some((rate, durMs, rms)) =>
          MediaFeatures(mediaId, kind, payload.length, contentHash(payload), rms,
            durMs, -1, -1, rate, "wav")
        case None => decodeImageIo(payload) match {
          case Some((w, h, lum, codec)) =>
            MediaFeatures(mediaId, kind, payload.length, contentHash(payload), lum,
              metaDurationMs, w, h, -1, codec)
          case None => StubCodec.decode(mediaId, kind, payload, metaDurationMs)
        }
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
      StructField("duration_ms", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("codec", StringType)))
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
        val f = decode(r.getLong(idI), r.getString(kindI), payload, dur)
        Row(f.mediaId, f.kind, f.byteLen, f.contentHash, f.brightness, f.durationMs,
          f.width, f.height, f.sampleRate, f.codec)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL image transform: nearest-neighbor resize of every PNM payload to
    * (newW, newH); non-PNM payloads pass through unchanged. Narrow
    * (mapPartitions), payloads never shuffle.
    */
  def resizeImages(df: DataFrame, newW: Int, newH: Int): DataFrame = {
    require(newW > 0 && newH > 0)
    val spark = df.sparkSession
    val payI = df.columns.indexOf("payload")
    require(payI >= 0, "expected a payload column")
    val schema = df.schema
    // keep meta.width/height in lockstep with the rewritten payload header
    // — a consumer trusting metadataOnly() must see the new dimensions,
    // not the pre-resize ones
    val metaI = df.columns.indexOf("meta")
    val (wI, hI) =
      if (metaI >= 0) schema(metaI).dataType match {
        case s: StructType => (s.fieldNames.indexOf("width"), s.fieldNames.indexOf("height"))
        case _ => (-1, -1)
      } else (-1, -1)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        if (r.isNullAt(payI)) r
        else {
          val payload = r.getAs[Array[Byte]](payI)
          resizePnmNearest(payload, newW, newH) match {
            case Some(resized) =>
              val withPayload = r.toSeq.updated(payI, resized)
              val out =
                if (metaI >= 0 && wI >= 0 && hI >= 0 && !r.isNullAt(metaI)) {
                  val m = r.getStruct(metaI)
                  val newMeta = Row.fromSeq(
                    m.toSeq.updated(wI, newW).updated(hI, newH))
                  withPayload.updated(metaI, newMeta)
                } else withPayload
              Row.fromSeq(out)
            case None => r
          }
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Nearest-neighbor resample of a P5/P6 payload; None if not PNM. */
  def resizePnmNearest(b: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
    parsePnmHeader(b).flatMap { hd =>
      val ch = if (hd.magic == '5') 1 else 3
      val need = hd.w.toLong * hd.h * ch
      if (b.length - hd.offset < need) None
      else {
        val header = s"P${hd.magic}\n$newW $newH\n${hd.maxval}\n".getBytes("US-ASCII")
        val out = new Array[Byte](header.length + newW * newH * ch)
        System.arraycopy(header, 0, out, 0, header.length)
        var y = 0
        var o = header.length
        while (y < newH) {
          val sy = (y.toLong * hd.h / newH).toInt
          var x = 0
          while (x < newW) {
            val sx = (x.toLong * hd.w / newW).toInt
            val src = hd.offset + (sy * hd.w + sx) * ch
            var c = 0
            while (c < ch) { out(o) = b(src + c); o += 1; c += 1 }
            x += 1
          }
          y += 1
        }
        Some(out)
      }
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
      // valid frame timestamps are [0, duration): the sequence bound is
      // duration - 1, and unknown/zero-duration videos plan no frames at
      // all rather than a phantom frame_ms = 0 work item
      .where(coalesce(col("meta.duration_ms"), lit(0L)) > 0L)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1L, lit(everyMs)))
          .as("frame_ms"))

  /** Metadata-only projection — binary column pruned at scan. */
  def metadataOnly(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("kind"), col("mime"),
      col("meta.width"), col("meta.height"), col("meta.duration_ms"), col("meta.sample_rate"))

  /** Synthesize a deterministic media table for tests/benchmarks: REAL P5
    * PGM images (gradient + seeded noise) and REAL PCM-16 WAV audio (sine
    * tones), plus random-byte "video" payloads exercising the stub path.
    */
  def synthetic(spark: org.apache.spark.sql.SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val kinds = Seq("image", "audio", "video")
    val rows = spark.range(n).rdd.map { id =>
      val rng = new scala.util.Random(seed + id)
      val kind = kinds(rng.nextInt(3))
      kind match {
        case "image" =>
          val w = 8 + rng.nextInt(25)
          val h = 8 + rng.nextInt(25)
          val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
          val px = new Array[Byte](w * h)
          var i = 0
          while (i < px.length) {
            val grad = (i % w) * 255 / math.max(1, w - 1)
            px(i) = (((grad + rng.nextInt(32)) % 256) & 0xFF).toByte
            i += 1
          }
          val payload = header ++ px
          Row(id, kind, "image/x-portable-graymap", payload,
            Row(w, h, null, null))
        case "audio" =>
          val rate = 8000
          val ms = 50 + rng.nextInt(200)
          val nSamp = rate * ms / 1000
          val data = new Array[Byte](nSamp * 2)
          val freq = 100.0 + rng.nextInt(900)
          var i = 0
          while (i < nSamp) {
            val v = (math.sin(2 * math.Pi * freq * i / rate) * 12000).toInt
            data(i * 2) = (v & 0xFF).toByte
            data(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
            i += 1
          }
          val payload = wavBytes(rate, data)
          Row(id, kind, "audio/wav", payload,
            Row(null, null, ms.toLong, rate))
        case _ =>
          val payload = new Array[Byte](64 + rng.nextInt(192))
          rng.nextBytes(payload)
          Row(id, kind, "video/x-test", payload,
            Row(null, null, 1000L + rng.nextInt(9000), null))
      }
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** Minimal PCM-16 mono RIFF WAV container around raw sample bytes. */
  def wavBytes(rate: Int, data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    out.array()
  }
}
