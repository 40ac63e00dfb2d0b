package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: when one join key holds a large share
  * of the left (fact) side, a plain hash join sends that whole key to ONE
  * task. Salting splits every left key into `saltBuckets` sub-keys with a
  * random salt and replicates the right (dimension) side once per salt —
  * the hot key's rows spread over `saltBuckets` tasks, at the price of a
  * `saltBuckets`x larger right side. Use when the right side is small-ish
  * but too big (or too dynamic) to broadcast, and AQE's skew handling
  * doesn't apply (e.g. non-shuffle stages feeding the join).
  *
  * The salt changes the PHYSICAL distribution only — the join result is
  * byte-identical to the unsalted join (q46 oracle-checks that against a
  * plain SQL join).
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `keyCols`, left side salted.
    *
    * @param saltBuckets parallelism per key; the right side is exploded by
    *                    this factor
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int = 8,
      seed: Long = 42L): DataFrame = {
    require(saltBuckets > 0)
    val saltCol = "__graft_skew_salt"
    val l = left.withColumn(saltCol, (rand(seed) * saltBuckets).cast("int"))
    val r = right.withColumn(saltCol,
      explode(array((0 until saltBuckets).map(lit): _*)))
    l.join(r, keyCols :+ saltCol).drop(saltCol)
  }
}
