package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketed point-in-interval equals the theta-join reference") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val points = (0 until 400).map(_ => (rng.nextInt(4).toLong, rng.nextInt(10000).toLong))
      .distinct.map { case (k, t) => (k, t, s"p$k-$t") }
    val intervals = (0 until 60).map { i =>
      val lo = rng.nextInt(9000).toLong
      (rng.nextInt(4).toLong, lo, lo + rng.nextInt(2000).toLong, i)
    }
    val got = RangeJoin.pointInInterval(
      points.toDF("k", "t", "tag"), intervals.toDF("k", "lo", "hi", "iid"),
      Seq("k"), "t", "lo", "hi", bucketWidth = 500)
      .select("k", "t", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val want = (for {
      (k, t, _) <- points
      (ik, lo, hi, iid) <- intervals
      if ik == k && t >= lo && t <= hi
    } yield (k, t, iid)).sorted
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("interval edges are inclusive; disjoint buckets don't lose matches") {
    import spark.implicits._
    val points = Seq((1L, 100L, "lo-edge"), (1L, 200L, "hi-edge"), (1L, 201L, "out"))
      .toDF("k", "t", "tag")
    val intervals = Seq((1L, 100L, 200L, 0)).toDF("k", "lo", "hi", "iid")
    // bucketWidth smaller than the interval: spans multiple buckets
    val tags = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi", 64)
      .select("tag").collect().map(_.getString(0)).toSet
    assert(tags === Set("lo-edge", "hi-edge"))
  }
}
