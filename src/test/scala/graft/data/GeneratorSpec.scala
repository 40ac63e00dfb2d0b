package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeneratorSpec extends SparkSpec {

  test("shape and column naming match the reference's CSV output (little_synt.csv)") {
    val df = Generator.classification(spark, 500, nFeatures = 10, nClasses = 3,
      nInformative = 5, nSensitive = 2, seed = 42)
    assert(df.count() === 500)
    assert(df.columns.toSeq === ((0 until 10).map(_.toString) ++ Seq("s1", "s2", "y")))
  }

  test("labels cover all classes; sensitive vars are near-balanced binary") {
    val df = Generator.classification(spark, 2000, nClasses = 3, nSensitive = 2, seed = 1).cache()
    val ys = df.select("y").distinct().collect().map(_.getInt(0)).toSet
    assert(ys === Set(0, 1, 2))
    val s1 = df.groupBy("s1").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(s1.keySet === Set(0, 1))
    assert(math.abs(s1(0) - s1(1)) < 300) // ~50/50 hash coin
    df.unpersist()
  }

  test("deterministic given seed; informative features separate classes") {
    val a = Generator.classification(spark, 300, seed = 7).agg(sum("0")).collect()(0).getDouble(0)
    val b = Generator.classification(spark, 300, seed = 7).agg(sum("0")).collect()(0).getDouble(0)
    assert(a === b)
    // class-conditional means of an informative feature differ
    val df = Generator.classification(spark, 3000, nClasses = 2, nInformative = 5, seed = 3)
    val means = df.groupBy("y").agg(avg("0")).collect().map(_.getDouble(1))
    assert(math.abs(means(0) - means(1)) > 0.5)
  }
}
