package graft.etl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankingSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    // shuffled values with duplicates in the first key; (v, id) is unique
    val rng = new scala.util.Random(7)
    rng.shuffle((1 to 997).toList).map(i => (i % 50, i.toLong)).toDF("v", "id")
      .repartition(7)
  }

  test("withGlobalRowNumber equals the single-partition rank") {
    val got = Ranking.withGlobalRowNumber(df, Seq(col("v"), col("id")), "rn", numPartitions = 5)
      .select("v", "id", "rn").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("rank is stable across repeated actions (deterministic boundaries)") {
    val ranked = Ranking.withGlobalRowNumber(df, Seq(col("v"), col("id")), "rn")
    val a = ranked.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = ranked.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a === b)
    // ranks are a permutation of 1..n
    assert(a.map(_._3).sorted === (1L to 997L))
  }

  test("withNtile matches SQL ntile bucket sizes and boundaries") {
    val got = Ranking.withNtile(df, Seq(col("v"), col("id")), 5, "bucket", numPartitions = 5)
      .select("v", "id", "bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getInt(2)).toMap
    val want = df.withColumn("bucket",
        ntile(5).over(Window.orderBy(col("v"), col("id"))))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got === want)
  }

  test("ntile with more buckets than rows gives one row per bucket") {
    import spark.implicits._
    val tiny = Seq((3, 1L), (1, 2L), (2, 3L)).toDF("v", "id")
    val got = Ranking.withNtile(tiny, Seq(col("v"), col("id")), 5, "bucket")
      .select("v", "bucket").collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got === Map(1 -> 1, 2 -> 2, 3 -> 3))
  }

  test("degenerate all-equal keys: still a permutation, exact ntile sizes") {
    import spark.implicits._
    // every sample key identical -> all split points equal -> a single
    // range id; correctness must not depend on boundary quality
    val flat = (1 to 500).map(i => (7, i.toLong)).toDF("v", "id").repartition(5)
    val ranked = Ranking.withGlobalRowNumber(flat, Seq(col("v")), "rn")
      .select("rn").collect().map(_.getLong(0)).sorted
    assert(ranked.toSeq === (1L to 500L))
    val buckets = Ranking.withNtile(flat, Seq(col("v")), 4, "b")
      .groupBy("b").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(buckets === Map(1 -> 125L, 2 -> 125L, 3 -> 125L, 4 -> 125L))
  }

  test("empty input ranks to an empty result") {
    val empty = df.where(col("v") < 0)
    assert(Ranking.withGlobalRowNumber(empty, Seq(col("v")), "rn").count() === 0)
    assert(Ranking.withNtile(empty, Seq(col("v")), 4, "b").count() === 0)
  }

  test("withGroupedNtile equals the window ntile on randomized group shapes") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    for (trial <- 0 until 5; k <- Seq(2, 3, 7)) {
      // uneven groups, duplicate sort keys, group counts above and below k
      val rows = (0 until 4 + rng.nextInt(6)).flatMap { g =>
        (0 until 1 + rng.nextInt(40)).map { i =>
          (s"g$g", rng.nextInt(12).toDouble, (g * 1000 + i).toLong)
        }
      }
      val df = rows.toDF("grp", "v", "id")
      val viaScalable = Ranking.withGroupedNtile(df, Seq("grp"),
          Seq(col("v"), col("id")), k, "b")
        .select($"id", $"b").as[(Long, Int)].collect().toMap
      val viaWindow = df.withColumn("b", ntile(k).over(
          Window.partitionBy($"grp").orderBy($"v", $"id")))
        .select($"id", $"b").as[(Long, Int)].collect().toMap
      assert(viaScalable === viaWindow, s"trial=$trial k=$k")
    }
  }

  test("withGroupedNtile keeps NULL group keys as their own partition") {
    import spark.implicits._
    // null lang rows must be bucketed like any other group (window
    // PARTITION BY semantics: NULL forms its own partition), not dropped
    val rows = Seq(
      (null.asInstanceOf[String], 1.0, 1L), (null.asInstanceOf[String], 2.0, 2L),
      (null.asInstanceOf[String], 3.0, 3L), (null.asInstanceOf[String], 4.0, 4L),
      ("en", 1.0, 10L), ("en", 2.0, 11L), ("en", 3.0, 12L),
      ("fr", 5.0, 20L))
    val df = rows.toDF("grp", "v", "id").repartition(3)
    val viaScalable = Ranking.withGroupedNtile(df, Seq("grp"),
        Seq(col("v"), col("id")), 3, "b")
      .select($"id", $"b").as[(Long, Int)].collect().toMap
    val viaWindow = df.withColumn("b", ntile(3).over(
        Window.partitionBy($"grp").orderBy($"v", $"id")))
      .select($"id", $"b").as[(Long, Int)].collect().toMap
    assert(viaScalable.size === 8, "no rows may be dropped")
    assert(viaScalable === viaWindow)
  }
}
