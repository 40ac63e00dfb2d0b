package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PoolingSpec extends SparkSpec {
  import spark.implicits._

  private def pool(rows: Seq[(Int, Seq[Double])], parts: Int,
      agg: org.apache.spark.sql.Column): Map[Int, Seq[Double]] = {
    rows.toDF("k", "v").repartition(parts)
      .groupBy("k").agg(agg.as("p"))
      .collect()
      .map(r => r.getInt(0) ->
        Option(r.getAs[scala.collection.Seq[Double]]("p")).map(_.toSeq).orNull)
      .toMap
  }

  private val data = Seq(
    (1, Seq(1.0, 2.0, 3.0)),
    (1, Seq(4.0, -2.0, 1.0)),
    (1, Seq(1.0, 0.0, 2.0)),
    (2, Seq(10.0, 20.0, 30.0)))

  test("mean/sum/max/min pools, any partitioning") {
    for (parts <- Seq(1, 3, 7)) {
      assert(pool(data, parts, Pooling.meanPool(col("v"))) ===
        Map(1 -> Seq(2.0, 0.0, 2.0), 2 -> Seq(10.0, 20.0, 30.0)), s"parts=$parts")
      assert(pool(data, parts, Pooling.sumPool(col("v"))) ===
        Map(1 -> Seq(6.0, 0.0, 6.0), 2 -> Seq(10.0, 20.0, 30.0)), s"parts=$parts")
      assert(pool(data, parts, Pooling.maxPool(col("v"))) ===
        Map(1 -> Seq(4.0, 2.0, 3.0), 2 -> Seq(10.0, 20.0, 30.0)), s"parts=$parts")
      assert(pool(data, parts, Pooling.minPool(col("v"))) ===
        Map(1 -> Seq(1.0, -2.0, 1.0), 2 -> Seq(10.0, 20.0, 30.0)), s"parts=$parts")
    }
  }

  test("float input pools as double; matches the cast-to-double pool") {
    val df = Seq((1, Seq(1.5f, 2.5f)), (1, Seq(0.5f, 0.5f))).toDF("k", "v")
    val viaFloat = df.groupBy("k").agg(Pooling.meanPool(col("v")).as("p"))
      .collect()(0).getAs[scala.collection.Seq[Double]]("p").toSeq
    val viaDouble = df.select(col("k"),
        transform(col("v"), x => x.cast("double")).as("v"))
      .groupBy("k").agg(Pooling.meanPool(col("v")).as("p"))
      .collect()(0).getAs[scala.collection.Seq[Double]]("p").toSeq
    assert(viaFloat === Seq(1.0, 1.5))
    assert(viaFloat === viaDouble)
  }

  test("NULL rows and null-element rows are skipped; all-NULL group is NULL") {
    val df = Seq[(Int, Seq[Option[Double]])](
      (1, Seq(Some(1.0), Some(2.0))),
      (1, null),
      (1, Seq(Some(9.0), None)), // partial vector: skipped whole
      (2, null))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(Pooling.meanPool(col("v")).as("p"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(out(1).get.asInstanceOf[scala.collection.Seq[Double]].toSeq === Seq(1.0, 2.0))
    assert(out(2).isEmpty)
  }

  test("dimension mismatch fails fast with the offending sizes") {
    val df = Seq((1, Seq(1.0, 2.0)), (1, Seq(1.0))).toDF("k", "v")
    val e = intercept[Exception] {
      df.groupBy("k").agg(Pooling.sumPool(col("v"))).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("non-array input is rejected at analysis") {
    val df = Seq((1, "x")).toDF("k", "v")
    val e = intercept[Exception] {
      df.groupBy("k").agg(Pooling.sumPool(col("v"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }

  test("empty arrays pool to an empty array (degenerate but total)") {
    val df = Seq((1, Seq.empty[Double]), (1, Seq.empty[Double])).toDF("k", "v")
    val out = df.groupBy("k").agg(Pooling.meanPool(col("v")).as("p"))
      .collect()(0).getAs[scala.collection.Seq[Double]]("p")
    assert(out.isEmpty)
  }

  test("NaN follows Spark sort semantics: max -> NaN wins, min -> NaN loses") {
    val df = Seq(
      (1, Seq(Double.NaN, 5.0, Double.NaN)),
      (1, Seq(2.0, Double.NaN, Double.NaN))).toDF("k", "v")
    val r = df.groupBy("k").agg(
      Pooling.maxPool(col("v")).as("mx"), Pooling.minPool(col("v")).as("mn"))
      .collect()(0)
    val mx = r.getAs[scala.collection.Seq[Double]]("mx")
    val mn = r.getAs[scala.collection.Seq[Double]]("mn")
    assert(mx(0).isNaN && mx(1).isNaN && mx(2).isNaN) // any NaN -> NaN
    assert(mn(0) === 2.0 && mn(1) === 5.0)            // NaN loses to a real
    assert(mn(2).isNaN)                               // all-NaN dim stays NaN
    // no ±Infinity sentinel can appear in any result
    assert(!mx.exists(_.isInfinite) && !mn.exists(_.isInfinite))
  }

  test("streaming: pooling state carries across micro-batches (complete mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Seq[Double])]
    val agg = in.toDF().toDF("k", "v")
      .groupBy(col("k")).agg(Pooling.meanPool(col("v")).as("m"))
    val q = agg.writeStream.format("memory").queryName("pool_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData((1, Seq(1.0, 2.0)), (2, Seq(10.0, 20.0)))
      q.processAllAvailable()
      in.addData((1, Seq(3.0, 4.0)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT k, m FROM pool_stream ORDER BY k").collect()
      // mean over BOTH micro-batches: state (sums, n) survived the store
      assert(rows(0).getAs[scala.collection.Seq[Double]]("m") === Seq(2.0, 3.0))
      assert(rows(1).getAs[scala.collection.Seq[Double]]("m") === Seq(10.0, 20.0))
    } finally q.stop()
  }

  test("integral-valued mean is bit-exact regardless of partitioning") {
    // the q83 oracle contract: quantized (integral) vectors -> exact sums
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextInt(3),
      Seq.fill(16)(rnd.nextInt(2001).toDouble - 1000.0)))
    val ref = pool(rows, 1, Pooling.meanPool(col("v")))
    for (parts <- Seq(4, 13, 32)) {
      assert(pool(rows, parts, Pooling.meanPool(col("v"))) === ref, s"parts=$parts")
    }
  }
}
