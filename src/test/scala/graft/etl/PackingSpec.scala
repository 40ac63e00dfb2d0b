package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("withRunningTotal matches the driver-side cumsum on seeded data") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0 until 5000).map(i => (i.toLong, rng.nextInt(900) + 100))
    val df = rows.toDF("id", "w").repartition(13)
    val got = Packing.withRunningTotal(df, Seq(col("id")), "w", "rt")
      .select("id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    rows.foreach { case (id, w) =>
      acc += w
      assert(got(id) === acc, s"running total diverged at id=$id")
    }
  }

  test("assignSequences: contiguous ids, budget respected at boundaries") {
    import spark.implicits._
    val df = Seq((0L, 1000), (1L, 1000), (2L, 1000), (3L, 1000), (4L, 1000))
      .toDF("id", "w")
    val out = Packing.assignSequences(df, Seq(col("id")), "w", budget = 2500L)
      .orderBy("id").collect().map(_.getLong(2))
    // before: 0,1000,2000,3000,4000 -> floor(/2500): 0,0,0,1,1
    assert(out.toSeq === Seq(0L, 0L, 0L, 1L, 1L))
  }

  test("withGroupedRunningTotal matches per-group driver cumsum") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0 until 4000).map(i => (i.toLong, s"g${i % 3}", rng.nextInt(100) + 1))
    val df = rows.toDF("id", "g", "w").repartition(17)
    val got = Packing
      .withGroupedRunningTotal(df, Seq("g"), Seq(col("id")), "w", "cum")
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val acc = scala.collection.mutable.Map.empty[String, Long]
    rows.sortBy(_._1).foreach { case (id, g, w) =>
      val c = acc.getOrElse(g, 0L) + w
      acc(g) = c
      assert(got((g, id)) === c, s"grouped running total diverged at ($g, $id)")
    }
  }

  test("withGroupedRunningTotal is stable under partitioning and range count") {
    import spark.implicits._
    val rows = (0 until 1000).map(i => (i.toLong, s"g${i % 2}", i % 7 + 1))
    val df = rows.toDF("id", "g", "w")
    val a = Packing.withGroupedRunningTotal(df, Seq("g"), Seq(col("id")), "w", "cum")
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Packing.withGroupedRunningTotal(df.repartition(23), Seq("g"), Seq(col("id")), "w", "cum",
        numPartitions = 5)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("sequence ids are dense from 0 and stable under repartitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val df = (0 until 3000).map(i => (i.toLong, rng.nextInt(500) + 1)).toDF("id", "w")
    val a = Packing.assignSequences(df, Seq(col("id")), "w", budget = 4096L)
      .select("id", "seq_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Packing.assignSequences(df.repartition(29), Seq(col("id")), "w", budget = 4096L)
      .select("id", "seq_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "seq assignment must not depend on physical partitioning")
    val ids = a.values.toSet
    assert(ids.min === 0L)
    assert(ids === (0L until ids.size).toSet, "sequence ids must be dense")
  }
}
