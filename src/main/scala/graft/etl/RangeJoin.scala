package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: attach to every point row the
  * interval rows of the same key that contain it — the other join family
  * relational engines special-case (`a.ts BETWEEN b.lo AND b.hi`) and a
  * plain Spark theta-join turns into a per-key nested loop.
  *
  * Plan: quantize the range dimension into fixed-width buckets; an interval
  * spanning b buckets is exploded into b rows, a point belongs to exactly
  * one bucket, and the join becomes an EQUI-join on (key, bucket) with a
  * cheap containment post-filter. Work scales with interval span / bucket
  * width instead of |points| x |intervals| per key; pick `bucketWidth` near
  * the typical interval length so most intervals explode into O(1) rows.
  */
object RangeJoin {

  /** Inner join: points (keyCols + `ptCol`) x intervals (keyCols + `loCol`,
    * `hiCol`, payload). Containment is inclusive on both ends. All range
    * columns must be numeric (epoch ms, not timestamps).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      ptCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val b = "__graft_range_bucket"
    val p = points.withColumn(b, floor(col(ptCol) / bucketWidth))
    val i = intervals.withColumn(b,
      explode(sequence(floor(col(loCol) / bucketWidth), floor(col(hiCol) / bucketWidth))))
    p.join(i, keyCols :+ b)
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop(b)
  }
}
