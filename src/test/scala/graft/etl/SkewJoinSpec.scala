package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join result is identical to the plain join on a skewed fixture") {
    import spark.implicits._
    // 90% of the left side hits key 1
    val left = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i % 7 + 2L, i)))
      .toDF("k", "x")
    val right = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
    val salted = SkewJoin.saltedEquiJoin(left, right, Seq("k"), saltBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val plain = left.join(right, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted === plain)
    assert(salted.length === 1000)
  }

  test("keys missing from the right side drop out (inner-join semantics)") {
    import spark.implicits._
    val left = Seq((1L, "a"), (99L, "b")).toDF("k", "v")
    val right = Seq((1L, "dim")).toDF("k", "name")
    val out = SkewJoin.saltedEquiJoin(left, right, Seq("k"), saltBuckets = 4).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 1L)
  }
}
