package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("asofLatest attaches the most recent right row at or before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 35L, "c"),
      (2L, 5L, "d")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 30L, 300.0),
      (2L, 9L, 900.0) // after user 2's only left row
    ).toDF("k", "ts", "v")
    val out = AsOfJoin.asofLatest(left, right, Seq("k"), "ts", Seq("v"))
      .orderBy("k", "ts").collect()
    assert(out.length === 4)
    // (1,10): right at ts=10 matches (<= semantics)
    assert(out(0).getDouble(3) === 100.0)
    // (1,20): still the ts=10 value
    assert(out(1).getDouble(3) === 100.0)
    // (1,35): ts=30 value
    assert(out(2).getDouble(3) === 300.0)
    // (2,5): no prior right row -> null
    assert(out(3).isNullAt(3))
    // left columns all preserved
    assert(out.map(_.getString(2)).toSeq === Seq("a", "b", "c", "d"))
  }

  test("multi-column payloads come from the same matched right row (no stale back-fill)") {
    import spark.implicits._
    val left = Seq((1L, 25L, "a"), (1L, 15L, "b")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, Some(100.0), Some("x")),
      (1L, 20L, None: Option[Double], Some("y")) // v1 null in the matched row
    ).toDF("k", "ts", "v1", "v2")
    val out = AsOfJoin.asofLatest(left, right, Seq("k"), "ts", Seq("v1", "v2"))
      .orderBy("ts").collect()
    // ts=15 matches the ts=10 row: both payloads from it
    assert(out(0).getDouble(3) === 100.0 && out(0).getString(4) === "x")
    // ts=25 matches the ts=20 row: v1 stays null (NOT back-filled from
    // ts=10), v2 is the matched row's value — columns never desynchronize
    assert(out(1).isNullAt(3), "null in matched row must not be back-filled from an older row")
    assert(out(1).getString(4) === "y")
  }

  test("asofLatest matches a driver-side reference on seeded random data") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val left = (0 until 300).map(_ => (rng.nextInt(5).toLong, rng.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, s"L$k-$t") }
    val right = (0 until 200).map(_ => (rng.nextInt(5).toLong, rng.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, k * 10000.0 + t) }
    val out = AsOfJoin.asofLatest(
      left.toDF("k", "ts", "tag"), right.toDF("k", "ts", "v"),
      Seq("k"), "ts", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val byKey = right.groupBy(_._1)
    left.foreach { case (k, t, _) =>
      val want = byKey.get(k).flatMap(_.filter(_._2 <= t).sortBy(_._2).lastOption.map(_._3))
      assert(out((k, t)) === want, s"key=$k ts=$t")
    }
  }
}
