package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PostProcessSpec extends SparkSpec {

  test("withCombined reproduces the reference's last-key-wins bug (utils.py:278-281)") {
    import spark.implicits._
    val df = Seq((1, 0, 0), (1, 1, 0), (0, 1, 0)).toDF("a", "b", "pred")
    // condition list (a=1, b=1): reference's loop only applies the LAST key
    val out = PostProcess.withCombined(df, Seq("a" -> 1, "b" -> 1))
    val combined = out.orderBy("a", "b").select("combined").collect().map(_.getInt(0))
    // rows ordered (0,1),(1,0),(1,1): combined = b==1 -> 1, 0, 1
    assert(combined.toSeq === Seq(1, 0, 1))
  }

  test("adjust equalizes per-group predicted-class distributions exactly") {
    import spark.implicits._
    // group 0: 80 pred=1, 20 pred=0; group 1: 20 pred=1, 80 pred=0
    val rows = (0 until 80).map(i => (0, 1, i)) ++ (0 until 20).map(i => (0, 0, 100 + i)) ++
      (0 until 20).map(i => (1, 1, 200 + i)) ++ (0 until 80).map(i => (1, 0, 300 + i))
    val df = rows.toDF("g", "pred", "id")
    val out = PostProcess.adjust(df, "g", "pred", seed = 1)
    val dist = out.groupBy("g", "pred").count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // overall: 100 pred=1 / 200 -> each group of 100 gets exactly 50/50
    assert(dist((0, 1)) === 50L)
    assert(dist((0, 0)) === 50L)
    assert(dist((1, 1)) === 50L)
    assert(dist((1, 0)) === 50L)
    assert(out.count() === 200)
  }

  test("adjust is a relabeling: row count and non-pred columns untouched") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i % 2, if (i < 70) 1 else 0, i)).toDF("g", "pred", "id")
    val out = PostProcess.adjust(df, "g", "pred", seed = 2)
    assert(out.count() === 100)
    assert(out.select("id").distinct().count() === 100)
  }

  test("already-balanced predictions pass through unchanged") {
    import spark.implicits._
    val df = Seq((0, 1), (0, 0), (1, 1), (1, 0)).toDF("g", "pred")
    val out = PostProcess.adjust(df, "g", "pred")
    val dist = out.groupBy("g", "pred").count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(dist.values.forall(_ === 1L))
  }
}
