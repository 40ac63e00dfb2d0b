package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StrategiesSpec extends SparkSpec {

  // two cells: (s=0) 30 rows, (s=1) 10 rows; features f1 in a known range
  private lazy val df = {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    ((0 until 30).map(i => (0, 1, 100.0 + rng.nextDouble * 10, i)) ++
      (0 until 10).map(i => (1, 1, 500.0 + rng.nextDouble * 10, 100 + i)))
      .toDF("s", "y", "f1", "f2")
  }
  private val key = Seq("s", "y")

  test("uniform: exact extra counts, schema preserved") {
    val out = Strategies.synthesizeUniform(df, key, Map(Seq[Any](1, 1) -> 7L), seed = 5)
    // dtype-preservation contract: names + types must match exactly
    // (nullability may widen through element_at/cast — acceptable)
    assert(out.schema.map(f => (f.name, f.dataType)) === df.schema.map(f => (f.name, f.dataType)))
    assert(out.count() === 7)
    assert(out.where(col("s") === 1 && col("y") === 1).count() === 7)
  }

  test("uniform: each feature value comes from the cell's empirical domain") {
    val out = Strategies.synthesizeUniform(df, key, Map(Seq[Any](1, 1) -> 20L), seed = 5).collect()
    // cell (1,1) has f1 in [500, 510) and f2 in [100, 110) — synthetic rows
    // must draw from THAT cell only, never from (0,1)
    out.foreach { r =>
      assert(r.getDouble(2) >= 500.0 && r.getDouble(2) < 510.0)
      assert(r.getInt(3) >= 100 && r.getInt(3) < 110)
    }
    // features drawn independently: some synthetic (f1, f2) pair should not
    // exist in the original cell
    val orig = df.where(col("s") === 1).collect().map(r => (r.getDouble(2), r.getInt(3))).toSet
    val franken = out.map(r => (r.getDouble(2), r.getInt(3))).count(!orig.contains(_))
    assert(franken > 0)
  }

  test("smote: interpolated rows stay within the cell's bounding box") {
    val out = Strategies.synthesizeSmote(df, key, Map(Seq[Any](1, 1) -> 15L), seed = 5)
    assert(out.count() === 15)
    out.collect().foreach { r =>
      assert(r.getInt(0) === 1)
      assert(r.getDouble(2) >= 500.0 && r.getDouble(2) < 510.0)
    }
  }

  test("adasyn variant produces the requested count") {
    val out = Strategies.synthesizeSmote(df, key, Map(Seq[Any](0, 1) -> 4L), seed = 5, adasyn = true)
    assert(out.count() === 4)
  }

  test("DEMV with strategy=uniform converges cells like random") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val data = (0 until 400).map { i =>
      val s1 = if (rng.nextDouble() < 0.7) 1 else 0
      val y = if (rng.nextDouble() < (if (s1 == 1) 0.7 else 0.3)) 1 else 0
      (rng.nextGaussian(), s1, y)
    }.toDF("f", "s1", "y")
    val demv = new DEMV(Seq("s1"), shuffleOutput = false, strategy = "uniform")
    val out = demv.fitTransform(data, "y")
    val actual = out.groupBy("s1", "y").count().collect()
      .map(r => (Seq(r.getInt(0)), r.getInt(1)) -> r.getLong(2)).toMap
    demv.getCellPlans.foreach { p =>
      assert(actual((p.combo, p.label.asInstanceOf[Int])) === p.targetSize)
    }
  }

  test("smote: cap-bound cell (> sampleCap rows) still interpolates inside the hull") {
    import spark.implicits._
    // one cell of 3000 rows > the 1024 default cap: neighbors come from the
    // seeded sample (warn logged), but every synthetic row must stay inside
    // the cell's per-feature convex hull
    val rng = new scala.util.Random(9)
    val big = (0 until 3000).map(i => (1, 1, 200.0 + rng.nextDouble * 50, i))
      .toDF("s", "y", "f1", "f2")
    val out = Strategies.synthesizeSmote(big, key, Map(Seq[Any](1, 1) -> 40L), seed = 5)
      .collect()
    assert(out.length === 40)
    out.foreach { r =>
      assert(r.getDouble(2) >= 200.0 && r.getDouble(2) <= 250.0, s"f1 out of hull: $r")
      assert(r.getInt(3) >= 0 && r.getInt(3) <= 2999, s"f2 out of hull: $r")
    }
  }

  test("uniform: null feature values survive the synthesis pipeline") {
    import spark.implicits._
    // a null f1 in the upsampled cell must not desynchronize the collected
    // feature map (collect_list drops nulls; the struct collect must not)
    val withNull = Seq(
      (1, 1, Some(500.0), 100), (1, 1, None, 101), (1, 1, Some(501.0), 102))
      .toDF("s", "y", "f1", "f2")
    val out = Strategies.synthesizeUniform(withNull, key, Map(Seq[Any](1, 1) -> 30L), seed = 5)
      .collect()
    assert(out.length === 30)
    // every row has a valid f2 from the cell; f1 may be null (drawn from a
    // null source row) or one of the cell's values
    out.foreach { r =>
      assert(r.getInt(3) >= 100 && r.getInt(3) <= 102)
      if (!r.isNullAt(2)) assert(r.getDouble(2) >= 500.0 && r.getDouble(2) <= 501.0)
    }
    assert(out.exists(_.isNullAt(2)), "some synthetic rows should draw the null value")
  }

  test("non-numeric feature columns raise a clear error") {
    import spark.implicits._
    val bad = Seq((0, 1, "text")).toDF("s", "y", "t")
    val e = intercept[IllegalArgumentException] {
      Strategies.synthesizeUniform(bad, Seq("s", "y"), Map(Seq[Any](0, 1) -> 1L), 1)
    }
    assert(e.getMessage.contains("numeric"))
  }
}
