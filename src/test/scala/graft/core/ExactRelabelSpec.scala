package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactRelabelSpec extends SparkSpec {

  test("relabels exactly the requested counts per cell and target") {
    import spark.implicits._
    // cell (g=0, pred=1): 200 rows; (g=0, pred=0): 100; (g=1, pred=1): 50
    val rows = (0 until 200).map(i => (0, 1, i)) ++
      (0 until 100).map(i => (0, 0, 1000 + i)) ++
      (0 until 50).map(i => (1, 1, 2000 + i))
    val df = rows.toDF("g", "pred", "id").repartition(5)
    val out = ExactRelabel.relabel(df, Seq("g", "pred"), "pred",
      Map(
        Seq[Any](0, 1) -> Seq((0: Any, 30L), (2: Any, 20L)),
        Seq[Any](1, 1) -> Seq((0: Any, 50L))),
      seed = 7, saltBuckets = 8)
    val dist = out.groupBy("g", "pred").count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(dist((0, 1)) === 150L) // 200 - 30 - 20
    assert(dist((0, 0)) === 130L) // 100 + 30
    assert(dist((0, 2)) === 20L)
    assert(dist.get((1, 1)).isEmpty) // whole cell moved
    assert(dist((1, 0)) === 50L)
    assert(out.count() === 350)
    assert(out.select("id").distinct().count() === 350) // pure relabel
  }

  test("moves exceeding the cell size are rejected") {
    import spark.implicits._
    val df = Seq((0, 1, 1), (0, 1, 2)).toDF("g", "pred", "id")
    intercept[IllegalArgumentException] {
      ExactRelabel.relabel(df, Seq("g", "pred"), "pred",
        Map(Seq[Any](0, 1) -> Seq((0: Any, 3L))))
    }
  }

  test("empty or zero moves return the input unchanged") {
    import spark.implicits._
    val df = Seq((0, 1, 1)).toDF("g", "pred", "id")
    assert(ExactRelabel.relabel(df, Seq("g", "pred"), "pred", Map.empty).collect()
      === df.collect())
    assert(ExactRelabel.relabel(df, Seq("g", "pred"), "pred",
      Map(Seq[Any](0, 1) -> Seq((0: Any, 0L)))).collect() === df.collect())
  }

  test("skewed salts: counts stay exact when one salt holds most of a cell") {
    import spark.implicits._
    // few rows + many salt buckets: most salts empty, capacity fix-up must
    // still land the exact total
    val df = (0 until 37).map(i => (0, 1, i)).toDF("g", "pred", "id")
    val out = ExactRelabel.relabel(df, Seq("g", "pred"), "pred",
      Map(Seq[Any](0, 1) -> Seq((0: Any, 19L))), seed = 3, saltBuckets = 64)
    val dist = out.groupBy("pred").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dist(0) === 19L)
    assert(dist(1) === 18L)
  }

  test("duplicate targets in a move list are merged, not overwritten") {
    import spark.implicits._
    val df = (0 until 100).map(i => (0, 1, i)).toDF("g", "pred", "id")
    // same target twice: 10 + 15 must relabel 25 rows total
    val out = ExactRelabel.relabel(df, Seq("g", "pred"), "pred",
      Map(Seq[Any](0, 1) -> Seq((0: Any, 10L), (0: Any, 15L))), seed = 5)
    val dist = out.groupBy("pred").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dist(0) === 25L)
    assert(dist(1) === 75L)
  }
}
