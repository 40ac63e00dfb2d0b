package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def pgm(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + px.length)
    System.arraycopy(header, 0, out, 0, header.length)
    px.indices.foreach(i => out(header.length + i) = px(i).toByte)
    out
  }

  test("DCT table: fixed-point cosine facts") {
    // k = 0 row is cos(0) = 1 everywhere
    (0 until 32).foreach(n => assert(ImageHash.DctTable(n) === 32768L))
    // k = 1: first sample cos(pi/64), last cos(63pi/64) = -first
    assert(ImageHash.DctTable(32) === math.round(32768.0 * math.cos(math.Pi / 64)))
    assert(ImageHash.DctTable(32 + 31) === -ImageHash.DctTable(32))
    // all magnitudes bounded by the scale
    assert(ImageHash.DctTable.forall(t => math.abs(t) <= 32768L))
  }

  test("pHash: flat image hashes to all-zero-ish bits; DC shift is invisible") {
    // constant image: every AC coeff 0, median-pair sum > 0 from DC, so
    // no bit exceeds it strictly except none -> hash 0; adding a
    // constant (brightness shift) must not change the hash
    val flat80 = Array.fill(36 * 32)(80)
    val flat200 = Array.fill(36 * 32)(200)
    val h1 = ImageHash.pHashOfGray(36, 32, flat80).get
    val h2 = ImageHash.pHashOfGray(36, 32, flat200).get
    assert(h1 === h2)
  }

  test("planted true rescale: pHash survives (<= 3 bits), fixture families discriminate") {
    // the q129 fixture: r=0 base 36x32, r=1 the same scene nearest-
    // upscaled 3/2 to 54x48, r=2 an inverted-gradient unrelated image
    (0L until 48L by 3L).foreach { id0 =>
      val Some((w0, h0, g0)) = ImageHash.decodeGray(ImageHash.phashFixtureBytes(id0))
      val Some((w1, h1, g1)) = ImageHash.decodeGray(ImageHash.phashFixtureBytes(id0 + 1))
      val Some((w2, h2, g2)) = ImageHash.decodeGray(ImageHash.phashFixtureBytes(id0 + 2))
      val p0 = ImageHash.pHashOfGray(w0, h0, g0).get
      val p1 = ImageHash.pHashOfGray(w1, h1, g1).get
      val p2 = ImageHash.pHashOfGray(w2, h2, g2).get
      assert(hamming(p0, p1) <= 3, s"family ${id0 / 3}: rescale moved pHash ${hamming(p0, p1)} bits")
      assert(hamming(p0, p2) > 6, s"family ${id0 / 3}: unrelated image too close (${hamming(p0, p2)})")
    }
  }

  test("rescale + JPEG recompress: dHash fails, pHash survives (the tier's reason to exist)") {
    // a photo-like base: an 8-px block mosaic (broad low-frequency
    // energy — every DCT-block coefficient decisively off the median)
    // plus per-pixel hash noise (the round-8 lesson: formula noise
    // without a hash term collapses under box-average invariance)
    val (w, h) = (64, 48)
    def noise(x: Int, y: Int): Int = {
      val v = x * 2654435761L + y * 40503L
      (((v ^ (v >>> 13)) % 23) + 23).toInt % 23
    }
    val base = Array.tabulate(w * h)(i => {
      val x = i % w; val y = i / w
      val v = (x / 8) * 41L + (y / 8) * 59L + 7L
      (40 + (v * v) % 170 + noise(x, y)).toInt
    })
    // the "editor": NEAREST rescale to a non-nesting 44x33 (the phase
    // shift real resamplers introduce — dHash's 9x8 grid buckets now
    // average different noisy pixel subsets), then lossy JPEG
    val (rw, rh) = (44, 33)
    val rescaled = Array.tabulate(rw * rh)(i => {
      val x = i % rw; val y = i / rw
      base((y * h / rh) * w + (x * w / rw))
    })
    val img = new java.awt.image.BufferedImage(rw, rh,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until rw * rh).foreach(i => img.getRaster.setSample(i % rw, i / rw, 0, rescaled(i)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val variantBytes = bos.toByteArray

    val origBytes = pgm(w, h, base)
    val d0 = ImageHash.dhash64Java(origBytes).longValue
    val d1 = ImageHash.dhash64Java(variantBytes).longValue
    val p0 = ImageHash.phash64Java(origBytes).longValue
    val p1 = ImageHash.phash64Java(variantBytes).longValue
    assert(hamming(d0, d1) > 3,
      s"dHash unexpectedly survived rescale+JPEG (${hamming(d0, d1)} bits) — the planted case needs a harder edit")
    assert(hamming(p0, p1) <= 3,
      s"pHash must survive rescale+JPEG, moved ${hamming(p0, p1)} bits")
  }

  test("pHash handles any size >= 1x1 and rejects undecodable payloads") {
    // tiny image: upscale path (nearest), deterministic
    val tiny = Array.tabulate(3 * 2)(i => i * 40)
    val a = ImageHash.pHashOfGray(3, 2, tiny)
    val b = ImageHash.pHashOfGray(3, 2, tiny)
    assert(a.isDefined && a === b)
    assert(ImageHash.phash64Java("not an image".getBytes) === null)
    // column path agrees with the driver kernel
    val bytes = pgm(36, 32, Array.tabulate(36 * 32)(i => (i * 7) % 256))
    val viaCol = Seq((1L, bytes)).toDF("id", "b")
      .select(ImageHash.phash64(col("b"))).first().getLong(0)
    val Some((ww, hh, gg)) = ImageHash.decodeGray(bytes)
    assert(viaCol === ImageHash.pHashOfGray(ww, hh, gg).get)
  }

  test("phashNearDupPairs finds the planted rescale pairs over the fixture") {
    val ids = (0L until 90L).toDF("doc_id")
    val imgs = ImageHash.syntheticImagesPhash(ids)
    val pairs = ImageHash.phashNearDupPairs(imgs, "doc_id", "bytes",
        maxHamming = 3, maxBucketSize = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every family's (base, rescaled) pair is present
    (0L until 90L by 3L).foreach { id0 =>
      assert(pairs.contains((id0, id0 + 1)), s"missing planted pair ($id0, ${id0 + 1})")
    }
    // and no (base, unrelated) pair is
    (0L until 90L by 3L).foreach { id0 =>
      assert(!pairs.contains((id0, id0 + 2)), s"spurious pair ($id0, ${id0 + 2})")
    }
  }
}
