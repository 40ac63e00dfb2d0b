package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.multimodal.ImageHash

/** Scale-decade evidence for L72 (perceptual image dedup): times
  * decode -> dHash -> blocked Hamming pair join over an UNBOUNDED
  * synthetic image corpus at the in-repo scale dirs (the q111 gate
  * fixture is deliberately capped at 3000 images so its all-pairs
  * DuckDB oracle stays sane; decades are measured here instead).
  *
  * The corpus reuses the gate fixture's family/variant structure
  * (g = id/3 families; r=0 base PGM, r=1 one-bucket-perturbed — PNG
  * for id%9==1, so the real ImageIO decode path is load-bearing —
  * r=2 unrelated) but derives the family base from a splitmix64 MIX
  * of g rather than the fixture's modular arithmetic: the gate
  * formula `(g*31 + ...) % 256` with a `(x+y+g) % 5` factor is
  * periodic in g with period 1280, which at 5M images would plant
  * ~1300 IDENTICAL copies of every family — the q41 identical-copy
  * corpus bug, measuring the skew guard rather than the operator.
  * Hash-mixed families make dHashes ~uniform, which is also the
  * ADVERSARIAL case for the 16-bit block join: uniform occupancy
  * n/2^16 per bucket is exactly the birthday-collision regime a real
  * 100 TB image corpus hits.
  *
  *   runMain graft.tools.ImageDedupScaleBench [dir1 dir2 ...]
  */
object ImageDedupScaleBench {

  // splitmix64 finalizer: full-avalanche 64-bit mix (public constant set)
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // Per-pixel hash noise, NOT a gradient formula: dHash compares
  // adjacent box AVERAGES, so any family formula of the shape
  // `offset(g) + gradient(x,y)` is (near-)invariant to the offset and
  // collapses every family onto a handful of hashes — the first cut of
  // this tool did exactly that and measured the skew cap (millions of
  // "pairs", scheme-dependent counts under cap truncation) instead of
  // the join. Random pixels give ~uniform dHashes: planted r0/r1 twins
  // at d <= 1, everything else at d ~ 32, which is both the honest and
  // the adversarial-occupancy regime for the block join.
  private[tools] def pixel(docId: Long, x: Int, y: Int, w: Int = 18): Int = {
    val g = docId / 3
    val r = docId % 3
    val seed = if (r == 2) mix64(g) ^ 0x5DEECE66DL else g
    val base = (mix64(seed * 1000003L + (y * w + x)) & 0xFF).toInt
    if (r == 1) math.min(base + (if (x < 2 && y < 2) 60 else 0), 255) else base
  }

  // phash mode uses 36x32 sources so the integral resize runs its REAL
  // (box-average) path rather than the tiny-image upscale special case
  private def bytesFor(docId: Long, w: Int = 18, h: Int = 16): Array[Byte] = {
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = pixel(docId, x, y, w); x += 1 }
      y += 1
    }
    if (docId % 9 == 1) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < px.length) { raster.setSample(i % w, i / w, 0, px(i)); i += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    } else {
      val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + px.length)
      System.arraycopy(header, 0, out, 0, header.length)
      var i = 0
      while (i < px.length) { out(header.length + i) = px(i).toByte; i += 1 }
      out
    }
  }

  def main(args: Array[String]): Unit = {
    // leading args may be a hash kind (dhash|phash) and/or a block
    // scheme (auto|block4|combo20); the rest are data dirs
    val hashes = Set("dhash", "phash")
    val schemes = Set("auto", "block4", "combo20")
    var rest = args.toSeq
    val hash = rest.headOption.filter(hashes).getOrElse("dhash")
    if (rest.headOption.exists(hashes)) rest = rest.drop(1)
    val scheme = rest.headOption.filter(schemes).getOrElse("auto")
    val dirArgs = if (rest.headOption.exists(schemes)) rest.drop(1) else rest
    val dirs = if (dirArgs.nonEmpty) dirArgs
      else Seq("/root/repo/testdata-sf1", "/root/repo/testdata-sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    dirs.foreach { dir =>
      val (iw, ih) = if (hash == "phash") (36, 32) else (18, 16)
      val imgs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long")).as[Long]
        .map(id => (id, bytesFor(id, iw, ih)))
        .toDF("doc_id", "bytes")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = imgs.count() // materialize generation outside the timed region
      var pairs = 0L
      val sec = time {
        pairs = (if (hash == "phash")
          ImageHash.phashNearDupPairs(imgs, "doc_id", "bytes",
            maxHamming = 3, maxBucketSize = 1000, blockScheme = scheme)
        else
          ImageHash.nearDupPairs(imgs, "doc_id", "bytes",
            maxHamming = 3, maxBucketSize = 1000, blockScheme = scheme)).count()
      }
      println(String.format(java.util.Locale.ROOT,
        """{"dir":"%s", "hash":"%s", "scheme":"%s", "n":%d, "near_dup_pairs":%d, "sec":%.2f}""",
        dir, hash, scheme, Long.box(n), Long.box(pairs), Double.box(sec)))
      imgs.unpersist()
    }
    spark.stop()
  }
}
