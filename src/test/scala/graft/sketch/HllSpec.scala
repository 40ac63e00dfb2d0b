package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  private val P = 11
  private val M = 1 << P

  private def registersOf(values: Seq[String], parts: Int): Seq[Int] = {
    val df = values.toDF("s").repartition(parts)
      .select(Kmv.hash60(col("s")).as("h"))
    df.agg(Hll.sketch(col("h"), P).as("reg")).collect()(0)
      .getAs[scala.collection.Seq[Int]]("reg").toSeq
  }

  test("registers match a reference computation and any partitioning") {
    val values = (1 to 3000).map(i => s"item-$i")
    // independent reference: md5-60 -> top-11-bit index, rho over the
    // 49-bit suffix — recomputed here without the aggregate
    val ref = new Array[Int](M)
    values.distinct.foreach { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val idx = (h >>> 49).toInt
      val w = h & ((1L << 49) - 1)
      val rho = if (w == 0L) 50 else 50 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > ref(idx)) ref(idx) = rho
    }
    for (parts <- Seq(1, 5, 16)) {
      assert(registersOf(values, parts) === ref.toSeq, s"parts=$parts")
    }
  }

  test("array<long> input equals exploded-long input") {
    val docs = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("b", "d")),
      (3L, Seq.empty[String])).toDF("id", "toks")
      .select(col("id"), transform(col("toks"), t => Kmv.hash60(t)).as("hs"))
    val viaArray = docs.agg(Hll.sketch(col("hs"), P).as("reg")).collect()(0)
      .getAs[scala.collection.Seq[Int]]("reg").toSeq
    val viaLong = docs.select(explode(col("hs")).as("h"))
      .agg(Hll.sketch(col("h"), P).as("reg")).collect()(0)
      .getAs[scala.collection.Seq[Int]]("reg").toSeq
    assert(viaArray === viaLong)
    assert(viaArray.exists(_ > 0))
  }

  test("merge of per-group sketches equals the direct union sketch") {
    val df = (1 to 4000).map(i => (s"g${i % 7}", s"val-$i")).toDF("g", "s")
      .select(col("g"), Kmv.hash60(col("s")).as("h"))
    val perGroup = df.groupBy(col("g")).agg(Hll.sketch(col("h"), P).as("reg"))
    val rolled = perGroup.agg(Hll.mergeSketches(col("reg"), P).as("reg"))
      .collect()(0).getAs[scala.collection.Seq[Int]]("reg").toSeq
    val direct = df.agg(Hll.sketch(col("h"), P).as("reg"))
      .collect()(0).getAs[scala.collection.Seq[Int]]("reg").toSeq
    assert(rolled === direct)
  }

  test("estimate accuracy: within 5 sigma (1.04/sqrt(m)) across decades") {
    for (n <- Seq(100, 2000, 50000)) {
      val df = (1 to n).map(i => s"card-$n-$i").toDF("s")
        .select(Kmv.hash60(col("s")).as("h"))
      val est = df.agg(Hll.sketch(col("h"), P).as("reg"))
        .select(Hll.estimate(col("reg"), P).as("est"))
        .collect()(0).getDouble(0)
      val sigma = 1.04 / math.sqrt(M.toDouble) * n
      assert(math.abs(est - n) <= 5 * sigma + 3,
        s"n=$n est=$est (|err| ${math.abs(est - n)} > ${5 * sigma + 3})")
    }
  }

  test("small cardinality routes through linear counting") {
    val n = 40
    val df = (1 to n).map(i => s"lc-$i").toDF("s")
      .select(Kmv.hash60(col("s")).as("h"))
    val row = df.agg(Hll.sketch(col("h"), P).as("reg"))
      .select(Hll.zeroCount(col("reg")).as("v"),
        Hll.estimate(col("reg"), P).as("est"))
      .collect()(0)
    val v = row.getInt(0)
    assert(v > 0 && v <= M - 1)
    // linear counting at this occupancy is near-exact
    assert(math.abs(row.getDouble(1) - n) < 3)
  }

  test("integer summaries match the registers") {
    val df = (1 to 500).map(i => s"sum-$i").toDF("s")
      .select(Kmv.hash60(col("s")).as("h"))
    val row = df.agg(Hll.sketch(col("h"), P).as("reg"))
      .select(col("reg"), Hll.zeroCount(col("reg")).as("v"),
        Hll.harmonicSum(col("reg"), P).as("s"),
        Hll.checksum(col("reg")).as("c"))
      .collect()(0)
    val reg = row.getAs[scala.collection.Seq[Int]]("reg")
    assert(row.getInt(1) === reg.count(_ == 0))
    val s = reg.map(r => 1L << (50 - r)).sum
    assert(row.getLong(2) === s)
    val c = reg.zipWithIndex.map { case (r, i) => r.toLong * (i + 1) }.sum
    assert(row.getLong(3) === c)
  }

  test("compiled estimator kernel is bit-identical to the builtin composition") {
    // cardinalities straddling the linear-counting / raw-estimator
    // switch (2.5 * m = 5120 at p = 11)
    for (n <- Seq(1, 40, 900, 5000, 20000)) {
      val df = (1 to n).map(i => s"cmp-$n-$i").toDF("s")
        .select(Kmv.hash60(col("s")).as("h"))
      val row = df.agg(Hll.sketch(col("h"), P).as("reg"))
        .select(Hll.estimate(col("reg"), P).as("builtin"),
          Hll.estimateCompiled(col("reg"), P).as("compiled"))
        .collect()(0)
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)), s"n=$n")
    }
    // NULL array -> NULL on both surfaces
    val nullRow = spark.range(1)
      .select(lit(null).cast("array<int>").as("reg"))
      .select(Hll.estimate(col("reg"), P).as("builtin"),
        Hll.estimateCompiled(col("reg"), P).as("compiled"))
      .collect()(0)
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1))
  }

  test("streaming: hll sketch aggregates across micro-batches, registers == batch") {
    // the scaladoc's "streaming-capable" claim, proven: an update-mode
    // grouped aggregation over micro-batches must land on BIT-IDENTICAL
    // registers to one batch pass over the union of the data
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch1 = (1 to 400).map(i => ("a", s"s-$i")) ++ (1 to 50).map(i => ("b", s"t-$i"))
    val batch2 = (200 to 700).map(i => ("a", s"s-$i")) ++ (1 to 50).map(i => ("b", s"t-$i"))
    val in = MemoryStream[(String, String)]
    val agg = in.toDF().toDF("grp", "s")
      .select(col("grp"), Kmv.hash60(col("s")).as("h"))
      .groupBy(col("grp")).agg(Hll.sketch(col("h"), P).as("reg"))
    val q = agg.writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      val streamed = spark.sql("SELECT grp, reg FROM hll_stream").collect()
        .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Int]]("reg").toSeq).toMap
      val direct = (batch1 ++ batch2).toDF("grp", "s")
        .select(col("grp"), Kmv.hash60(col("s")).as("h"))
        .groupBy(col("grp")).agg(Hll.sketch(col("h"), P).as("reg")).collect()
        .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Int]]("reg").toSeq).toMap
      assert(streamed === direct)
    } finally q.stop()
  }

  test("null hashes are skipped; null register rows are skipped in merge") {
    val df = Seq[java.lang.Long](1L, null, 7L).toDF("h")
    val reg = df.agg(Hll.sketch(col("h"), P).as("reg")).collect()(0)
      .getAs[scala.collection.Seq[Int]]("reg")
    assert(reg.count(_ > 0) <= 2)
    val merged = df.agg(Hll.sketch(col("h"), P).as("reg"))
      .select(lit(1).as("k"), col("reg"))
      .union(df.limit(0).agg(Hll.sketch(col("h"), P).as("reg"))
        .select(lit(1).as("k"), lit(null).cast("array<int>").as("reg")))
      .groupBy(col("k")).agg(Hll.mergeSketches(col("reg"), P).as("m"))
      .collect()(0).getAs[scala.collection.Seq[Int]]("m")
    assert(merged === reg)
  }
}
