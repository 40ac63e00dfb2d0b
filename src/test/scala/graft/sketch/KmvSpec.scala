package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(values: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    val df = values.toDF("h").repartition(parts)
    df.agg(Kmv.sketch(col("h"), k).as("sk")).collect()(0)
      .getAs[scala.collection.Seq[Long]]("sk").toSeq
  }

  test("sketch is the k smallest distinct values, any partitioning") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(5000)(rnd.nextLong().abs % 100000L)
    val expected = values.distinct.sorted.take(64)
    for (parts <- Seq(1, 4, 13)) {
      assert(sketchOf(values, 64, parts) === expected, s"parts=$parts")
    }
  }

  test("sketch smaller than k is the full distinct set") {
    assert(sketchOf(Seq(5L, 3L, 5L, 9L), 64, 3) === Seq(3L, 5L, 9L))
  }

  test("array<long> input adds every element — equals exploded-long sketch") {
    val docs = Seq(
      (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(20L, 40L)),
      (3L, Seq.empty[Long])).toDF("id", "hs")
    val viaArray = docs.agg(Kmv.sketch(col("hs"), 8).as("sk")).collect()(0)
      .getAs[scala.collection.Seq[Long]]("sk").toSeq
    val viaLong = docs.select(explode(col("hs")).as("h"))
      .agg(Kmv.sketch(col("h"), 8).as("sk")).collect()(0)
      .getAs[scala.collection.Seq[Long]]("sk").toSeq
    assert(viaArray === Seq(10L, 20L, 30L, 40L))
    assert(viaArray === viaLong)
  }

  test("null hashes are skipped") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (7L, "c"))
      .toDF("h", "x")
    val sk = df.agg(Kmv.sketch(col("h"), 4).as("sk")).collect()(0)
      .getAs[scala.collection.Seq[Long]]("sk").toSeq
    assert(sk === Seq(1L, 7L))
  }

  test("distinct estimate: exact below k, within KMV error above") {
    val k = 256
    val n = 20000
    // deterministic "uniform" 60-bit hashes via the portable convention
    val df = (1 to n).map(i => s"doc-$i").toDF("s")
      .select(Kmv.hash60(col("s")).as("h"))
    val est = df.agg(Kmv.sketch(col("h"), k).as("sk"))
      .select(Kmv.distinctEstimate(col("sk"), k).as("est"))
      .collect()(0).getDouble(0)
    // stderr ~ n/sqrt(k-2) => 4 sigma ≈ 0.25 n; generous but non-vacuous
    assert(math.abs(est - n) < 0.25 * n, s"est=$est for n=$n")

    val small = sketchOf(Seq(1L, 2L, 3L), 64, 2)
    val exact = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
      .select(array(col("a"), col("b"), col("c")).as("sk"))
      .select(Kmv.distinctEstimate(col("sk"), 64).as("est"))
      .collect()(0).getDouble(0)
    assert(small.size === 3 && exact === 3.0)
  }

  test("jaccard estimate tracks true overlap") {
    val k = 256
    // two sets of 4000 strings sharing exactly 2000 => true J = 2000/6000
    val setA = (1 to 2000).map(i => s"shared-$i") ++ (1 to 2000).map(i => s"onlya-$i")
    val setB = (1 to 2000).map(i => s"shared-$i") ++ (1 to 2000).map(i => s"onlyb-$i")
    val df = (setA.map(_ -> "A") ++ setB.map(_ -> "B")).toDF("s", "grp")
      .select(col("grp"), Kmv.hash60(col("s")).as("h"))
    val sk = df.groupBy(col("grp")).agg(Kmv.sketch(col("h"), k).as("sk"))
    val row = sk.where(col("grp") === "A").select(col("sk").as("ska"))
      .crossJoin(sk.where(col("grp") === "B").select(col("sk").as("skb")))
      .select(
        Kmv.jaccardEstimate(col("ska"), col("skb"), k).as("j"),
        Kmv.intersectionEstimate(col("ska"), col("skb"), k).as("i"))
      .collect()(0)
    val trueJ = 2000.0 / 6000.0
    assert(math.abs(row.getDouble(0) - trueJ) < 4.0 / math.sqrt(k) + 0.02,
      s"estimated J=${row.getDouble(0)} vs true $trueJ")
    assert(math.abs(row.getDouble(1) - 2000.0) < 0.35 * 2000.0,
      s"estimated intersection=${row.getDouble(1)} vs true 2000")
  }

  test("re-aggregation: sketch of per-group sketches == sketch of the union") {
    // the array-input path makes the aggregate its own merge operator, so
    // per-source sketches roll up to a global sketch without raw data
    val rnd = new scala.util.Random(23)
    val values = Seq.fill(3000)((rnd.nextLong().abs % 50000L, rnd.nextInt(7)))
    val df = values.toDF("h", "grp")
    val perGroup = df.groupBy(col("grp")).agg(Kmv.sketch(col("h"), 64).as("sk"))
    val rolled = perGroup.agg(Kmv.sketch(col("sk"), 64).as("sk")).collect()(0)
      .getAs[scala.collection.Seq[Long]]("sk").toSeq
    val direct = df.agg(Kmv.sketch(col("h"), 64).as("sk")).collect()(0)
      .getAs[scala.collection.Seq[Long]]("sk").toSeq
    assert(rolled === direct)
  }

  test("streaming: kmv sketch aggregates across micro-batches (update mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val agg = in.toDF().toDF("grp", "h")
      .groupBy(col("grp")).agg(Kmv.sketch(col("h"), 8).as("sk"))
    val q = agg.writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(("a", 5L), ("a", 3L), ("b", 9L))
      q.processAllAvailable()
      in.addData(("a", 4L), ("a", 3L), ("b", 1L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT grp, sk FROM kmv_stream ORDER BY grp").collect()
      assert(rows(0).getAs[scala.collection.Seq[Long]]("sk") === Seq(3L, 4L, 5L))
      assert(rows(1).getAs[scala.collection.Seq[Long]]("sk") === Seq(1L, 9L))
    } finally q.stop()
  }

  test("property sweep: buffer equals k-smallest-distinct under random orders, splits, merges") {
    // pure buffer-level sweep (no Spark): 300 random cases of insertion
    // order, duplicate density, k, and arbitrary split-into-sub-buffers
    // merge trees must all land on sorted(distinct).take(k)
    val rnd = new scala.util.Random(99)
    (0 until 300).foreach { caseNo =>
      val k = 1 + rnd.nextInt(64)
      val n = rnd.nextInt(500)
      val domain = 1 + rnd.nextInt(300) // small domain => many duplicates
      val values = Seq.fill(n)(rnd.nextInt(domain).toLong)
      val expected = values.distinct.sorted.take(k)
      // direct insertion
      val direct = new KmvBuffer(k)
      values.foreach(direct.add)
      assert(direct.toSortedArray.toSeq === expected, s"case $caseNo direct")
      // random split into sub-buffers, merged in random order (with serde)
      if (n > 0) {
        val parts = rnd.shuffle(values).grouped(1 + rnd.nextInt(n)).toSeq
        val agg = KmvSketchAgg(
          org.apache.spark.sql.catalyst.expressions.Literal(0L), k)
        val merged = parts.map { p =>
          val b = new KmvBuffer(k)
          p.foreach(b.add)
          agg.deserialize(agg.serialize(b)) // round-trip like a shuffle
        }.reduce { (x, y) => x.mergeIn(y); x }
        assert(merged.toSortedArray.toSeq === expected, s"case $caseNo merged")
      }
    }
  }

  test("estimator math matches the documented closed forms") {
    // hand-check: sketch [100, 200, 400] with k=3 full => est = 2 * 2^60 / 400
    val est = Seq(1).toDF("x")
      .select(array(lit(100L), lit(200L), lit(400L)).as("sk"))
      .select(Kmv.distinctEstimate(col("sk"), 3).as("est"))
      .collect()(0).getDouble(0)
    assert(est === 2.0 * math.pow(2, 60) / 400.0)
  }

  test("NULL sketch estimates NULL, not -1 (outer-join hole), Column and SQL") {
    val df = Seq(1).toDF("x")
      .select(lit(null).cast("array<bigint>").as("sk"))
    val viaColumn = df.select(Kmv.distinctEstimate(col("sk"), 3)).collect()(0)
    assert(viaColumn.isNullAt(0))
    // isolated session like GraftSqlSpec: graft_* must not leak into the
    // shared session
    val sqlSession = spark.newSession()
    graft.sql.GraftFunctions.register(sqlSession)
    import sqlSession.implicits._
    Seq(1).toDF("x").select(lit(null).cast("array<bigint>").as("sk"))
      .createOrReplaceTempView("null_sk")
    val viaSql = sqlSession.sql(
      "SELECT graft_kmv_distinct_estimate(sk, 3) FROM null_sk").collect()(0)
    assert(viaSql.isNullAt(0))
  }

  test("NULL sketch jaccard estimates NULL, not perfect similarity, Column and SQL") {
    val df = Seq(1).toDF("x").select(
      lit(null).cast("array<bigint>").as("a"),
      array(lit(1L), lit(2L)).as("b"))
    val viaColumn = df.select(Kmv.jaccardEstimate(col("a"), col("b"), 4)).collect()(0)
    assert(viaColumn.isNullAt(0))
    val sqlSession = spark.newSession()
    graft.sql.GraftFunctions.register(sqlSession)
    import sqlSession.implicits._
    // temp views are session-scoped: rebuild the fixture in sqlSession
    Seq(1).toDF("x").select(
        lit(null).cast("array<bigint>").as("a"),
        array(lit(1L), lit(2L)).as("b"))
      .createOrReplaceTempView("null_jac")
    val viaSql = sqlSession.sql(
      "SELECT graft_kmv_jaccard_estimate(a, b, 4) FROM null_jac").collect()(0)
    assert(viaSql.isNullAt(0))
  }
}
