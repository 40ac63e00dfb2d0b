package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecodeSpec extends SparkSpec {

  test("binarize: pandas loc-threshold idiom (getdataset.py:99-101)") {
    import spark.implicits._
    val out = Seq(1.0, 5.0, 10.0).toDF("x")
      .select(Recode.binarize(col("x"), 5.0).as("b")).collect().map(_.getInt(0))
    assert(out.toSeq === Seq(0, 1, 1))
  }

  test("cut: right-closed bins, outside -> null (pandas cut)") {
    import spark.implicits._
    val out = Seq(0.0, 5.0, 10.0, 15.0, 99.0).toDF("x")
      .select(Recode.cut(col("x"), Seq(0, 10, 20), Seq("lo", "hi")).as("b"))
      .collect().map(_.getString(0))
    // 0 is NOT in (0,10] -> null; 5,10 -> lo; 15 -> hi; 99 -> null
    assert(out.toSeq === Seq(null, "lo", "lo", "hi", null))
  }

  test("qcut: near-equal-frequency buckets with exact quantiles") {
    import spark.implicits._
    val df = (1 to 90).map(_.toDouble).toDF("x")
    val out = Recode.qcut(df, "x", 3, Seq("a", "b", "c"))
    val sizes = out.groupBy("x_bin").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes === Map("a" -> 30L, "b" -> 30L, "c" -> 30L))
  }

  test("oneHot: literal column-per-value (getdataset.py:35-48)") {
    import spark.implicits._
    val df = Seq("red", "blue", "red").toDF("c")
    val out = Recode.oneHot(df, "c")
    assert(out.columns.toSet === Set("c", "red", "blue"))
    val reds = out.where(col("c") === "red").select("red", "blue").collect()
    assert(reds.forall(r => r.getInt(0) == 1 && r.getInt(1) == 0))
  }

  test("oneHot: case-colliding categories keep last-wins, no AnalysisException") {
    import spark.implicits._
    // "Yes" and "yes" collide under Spark's case-insensitive resolution;
    // the old withColumn fold silently produced one last-wins column, and
    // the single-Project rewrite must preserve that instead of throwing.
    val df = Seq("Yes", "yes", "no").toDF("c")
    val out = Recode.oneHot(df, "c")
    assert(out.columns.count(_.equalsIgnoreCase("yes")) === 1)
    // sorted values = ["Yes", "no", "yes"]; last-wins keeps the "yes" dummy
    val rows = out.where(col("c") === "yes").select("yes").collect()
    assert(rows.head.getInt(0) === 1)
  }

  test("oneHot: under spark.sql.caseSensitive=true both case-colliding dummies survive") {
    // with case-sensitive resolution "Yes" and "yes" are distinct legal
    // column names — deduping there would silently drop a category and
    // encode its rows as all-zeros
    val s = spark.newSession()
    s.conf.set("spark.sql.caseSensitive", "true")
    import s.implicits._
    val df = Seq("Yes", "yes", "no").toDF("c")
    val out = Recode.oneHot(df, "c")
    assert(out.columns.count(_.equalsIgnoreCase("yes")) === 2)
    val byVal = out.collect().map(r => r.getString(0) ->
      (r.getAs[Int]("Yes"), r.getAs[Int]("yes"))).toMap
    assert(byVal("Yes") === ((1, 0)))
    assert(byVal("yes") === ((0, 1)))
  }

  test("replaceValues") {
    import spark.implicits._
    val out = Seq("never", "often").toDF("c")
      .select(Recode.replaceValues(col("c"), Map("never" -> "0", "often" -> "1")).as("r"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("0", "1"))
  }

  test("zscore: sample std, all columns in one pass (getdataset.py:172)") {
    import spark.implicits._
    val df = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)).toDF("a", "b")
    val out = Recode.zscore(df, Seq("a", "b")).collect()
    val as = out.map(_.getDouble(0))
    assert(math.abs(as.sum) < 1e-12)
    assert(math.abs(as.max - 1.0) < 1e-12) // (3-2)/1
  }

  test("dropAllNullColumns") {
    import spark.implicits._
    val df = Seq((Some(1), Option.empty[Int], "x"), (Some(2), Option.empty[Int], "y"))
      .toDF("keep1", "allnull", "keep2")
    val out = Recode.dropAllNullColumns(df)
    assert(out.columns.toSet === Set("keep1", "keep2"))
  }
}
