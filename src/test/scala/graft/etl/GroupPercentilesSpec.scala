package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GroupPercentilesSpec extends SparkSpec {

  test("matches Spark's exact percentile aggregate on seeded data, incl. p=0/1") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val df = (0 until 4000).map { i =>
      (s"g${i % 5}", rng.nextDouble() * 1000, rng.nextGaussian() * 50)
    }.toDF("g", "x", "y").repartition(11)

    val specs = Seq(
      GroupPercentiles.PctSpec("x", 0.0, "x_min"),
      GroupPercentiles.PctSpec("x", 0.25, "x_p25"),
      GroupPercentiles.PctSpec("x", 0.9, "x_p90"),
      GroupPercentiles.PctSpec("x", 1.0, "x_max"),
      GroupPercentiles.PctSpec("y", 0.5, "y_med"))
    val got = GroupPercentiles.exact(df, Seq("g"), specs)
      .collect().map(r => r.getString(0) ->
        (1 until 6).map(i => r.getDouble(i))).toMap

    val want = df.groupBy("g").agg(
      expr("percentile(x, 0.0)"), expr("percentile(x, 0.25)"),
      expr("percentile(x, 0.9)"), expr("percentile(x, 1.0)"),
      expr("percentile(y, 0.5)"))
      .collect().map(r => r.getString(0) ->
        (1 until 6).map(i => r.getDouble(i))).toMap

    assert(got.keySet === want.keySet)
    got.foreach { case (g, vals) =>
      vals.zip(want(g)).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-9, s"group $g spec $i: $a vs $b")
      }
    }
  }

  test("a NULL group key gets its own percentiles (null-safe rank join)") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 3.0), (null, 10.0), (null, 20.0), (null, 30.0))
      .toDF("g", "x")
    val out = GroupPercentiles.exact(df, Seq("g"),
      Seq(GroupPercentiles.PctSpec("x", 0.5, "x_med")))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(out(Some("a")) === 2.0)
    assert(out(None) === 20.0)
  }

  test("nulls ignored; all-null group gets null for that column only") {
    import spark.implicits._
    val df = Seq[(String, Option[Double], Option[Double])](
      ("a", Some(1.0), Some(10.0)), ("a", Some(3.0), None),
      ("b", None, Some(5.0)), ("b", None, Some(7.0))
    ).toDF("g", "x", "y")
    val out = GroupPercentiles.exact(df, Seq("g"), Seq(
      GroupPercentiles.PctSpec("x", 0.5, "xm"),
      GroupPercentiles.PctSpec("y", 0.5, "ym")))
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1))),
         (if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out("a") === ((Some(2.0), Some(10.0)))) // y: single non-null
    assert(out("b") === ((None, Some(6.0))))
  }

  test("approx_percentile (the sketch-based scale alternative) stays within its accuracy bound of exact") {
    import spark.implicits._
    // documents the trade: GroupPercentiles is exact in 3 bounded jobs;
    // Spark's approx_percentile is one pass with a mergeable GK sketch
    // whose rank error is n/accuracy — the right choice when percentiles
    // feed monitoring rather than results
    val rng = new scala.util.Random(5)
    val n = 20000
    val vals = Array.fill(n)(rng.nextDouble() * 1000)
    val df = vals.toSeq.toDF("x").withColumn("g", lit("all"))
    val accuracy = 1000 // rank error <= n/accuracy = 20 ranks
    val approx = df.agg(
      expr(s"approx_percentile(x, array(0.5, 0.9), $accuracy)")).collect()(0)
      .getSeq[Double](0)
    val sorted = vals.sorted
    Seq(0.5, 0.9).zip(approx).foreach { case (p, a) =>
      // the approx answer's RANK must be within n/accuracy of the target
      val rank = sorted.count(_ <= a)
      val target = p * (n - 1)
      assert(math.abs(rank - target) <= n / accuracy + 1,
        s"p=$p: rank $rank vs target $target")
    }
  }

  test("single-row groups and integer columns") {
    import spark.implicits._
    val df = Seq(("a", 7), ("b", 1), ("b", 2)).toDF("g", "x")
    val out = GroupPercentiles.exact(df, Seq("g"), Seq(
      GroupPercentiles.PctSpec("x", 0.75, "p")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") === 7.0)
    assert(out("b") === 1.75) // (2-1)*0.75 interpolated
  }
}
