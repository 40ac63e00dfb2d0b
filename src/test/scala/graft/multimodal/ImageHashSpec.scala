package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def pgm(w: Int, h: Int, px: Seq[Int]): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ px.map(_.toByte).toArray
  }

  test("dHash reference: 9x8 image is its own grid") {
    // ascending rows: every adjacent comparison g(x) < g(x+1) is true
    // within the first 8 columns -> all 64 bits set
    val px = for (y <- 0 until 8; x <- 0 until 9) yield x * 10
    val Some((w, h, g)) = ImageHash.decodeGray(pgm(9, 8, px))
    assert((w, h) === (9, 8))
    assert(ImageHash.dHashOfGray(w, h, g) === Some(-1L)) // all 64 bits
    // descending: no bit set
    val desc = for (y <- 0 until 8; x <- 0 until 9) yield 200 - x * 10
    assert(ImageHash.dHashOfGray(9, 8, desc.toArray) === Some(0L))
  }

  test("box average: hand-computed 18x16 bucket") {
    // constant-value quadrants: bucket value equals the constant
    val px = for (y <- 0 until 16; x <- 0 until 18)
      yield if (x < 2 && y < 2) 100 else 20
    val Some((w, h, g)) = ImageHash.decodeGray(pgm(18, 16, px))
    val sum = ImageHash.dHashOfGray(w, h, g)
    // bucket(0,0)=100, bucket(0,1)=20 -> bit 0 (g00 < g01) NOT set;
    // all other adjacent pairs equal -> strict < false -> hash 0
    assert(sum === Some(0L))
    val inv = for (y <- 0 until 16; x <- 0 until 18)
      yield if (x < 2 && y < 2) 20 else 100
    val Some((_, _, g2)) = ImageHash.decodeGray(pgm(18, 16, inv))
    assert(ImageHash.dHashOfGray(w, h, g2) === Some(1L)) // only bit 0
  }

  test("PGM and grayscale PNG byte paths agree on the same pixels") {
    val ids = Seq(9L, 10L, 11L) // one fixture family: PGM, PNG (10 % 9 == 1), PGM
    for (id <- ids) {
      val bytes = ImageHash.fixtureBytes(id)
      val Some((w, h, g)) = ImageHash.decodeGray(bytes)
      assert((w, h) === (ImageHash.FixtureW, ImageHash.FixtureH))
      val expected = for (y <- 0 until h; x <- 0 until w)
        yield ImageHash.fixturePixel(id, x, y)
      assert(g.toSeq === expected, s"decode mismatch for id=$id (variant ${id % 3})")
    }
  }

  test("undecodable, truncated and sub-grid payloads hash to null") {
    assert(ImageHash.dhash64Java("not an image".getBytes) === null)
    assert(ImageHash.dhash64Java(pgm(18, 16, Seq.fill(100)(5))) === null) // truncated
    assert(ImageHash.dhash64Java(pgm(4, 4, Seq.fill(16)(5))) === null)    // < 9x8
    val df = Seq((1L, "garbage".getBytes)).toDF("id", "bytes")
    val out = df.select(ImageHash.dhash64(col("bytes")).as("h")).collect()
    assert(out(0).isNullAt(0))
  }

  test("planted near-dup pair found; unrelated variant and families are not") {
    val ids = (0L until 30L).toDF("doc_id")
    val imgs = ImageHash.syntheticImages(ids)
    val pairs = ImageHash.nearDupPairs(imgs, "doc_id", "bytes",
        maxHamming = 3, maxBucketSize = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every family's (base, perturbed) pair must be present
    for (g <- 0 until 10) {
      assert(pairs.contains((g * 3L, g * 3L + 1)), s"family $g pair missing")
    }
    // the unrelated variant should not pair with its family base
    for (g <- 0 until 10) {
      assert(!pairs.contains((g * 3L, g * 3L + 2)), s"family $g unrelated paired")
    }
  }

  test("expression survives codegen and matches interpreted eval") {
    val ids = (0L until 9L).toDF("doc_id")
    val imgs = ImageHash.syntheticImages(ids)
    val viaExpr = imgs.select(col("doc_id"), ImageHash.dhash64(col("bytes")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaJvm = imgs.collect().map { r =>
      r.getLong(0) -> ImageHash.dhash64Java(r.getAs[Array[Byte]]("bytes")).longValue()
    }.toMap
    assert(viaExpr === viaJvm)
    assert(viaExpr.values.toSet.size > 1)
  }
}
