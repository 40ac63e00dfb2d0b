package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic classification dataset source (reference
  * `replication_package/data/generator.py:19-29`: `make_classification` +
  * balanced binary sensitive columns + shuffle).
  *
  * Spark-native construction — fully distributed, zero shuffles:
  * `spark.range(n)` drives everything; the label and the sensitive bits are
  * deterministic hash functions of the row id (seeded), features are seeded
  * `randn` with class-dependent offsets on the informative ones (the
  * gaussian-cluster structure make_classification builds). At any scale
  * this is a single codegen'd projection over a range scan.
  *
  * Deviations from the reference, by design: sensitive bits are iid
  * fair-coin hashes (~50/50) instead of exactly-half fills + full shuffle
  * (an artifact of the pandas construction, and a global sort at scale);
  * column naming matches the reference's CSV output ("0".."f-1", "s1"...,
  * "y" — see `little_synt.csv`).
  */
object Generator {

  def classification(
      spark: SparkSession,
      nSamples: Long,
      nFeatures: Int = 10,
      nClasses: Int = 2,
      nInformative: Int = 5,
      nSensitive: Int = 2,
      seed: Long = 42L): DataFrame = {
    require(nInformative <= nFeatures, "nInformative must be <= nFeatures")
    val rng = new scala.util.Random(seed)
    // class-cluster offsets for informative features (make_classification
    // places one gaussian cluster per class)
    val offsets = Array.fill(nClasses, nInformative)(rng.nextGaussian() * 2.0)

    var df: DataFrame = spark.range(nSamples).toDF()
    val label = pmod(xxhash64(col("id"), lit(seed)), lit(nClasses)).cast("int")
    df = df.withColumn("y", label)
    for (j <- 0 until nFeatures) {
      val noise = randn(seed + 1000 + j)
      val feature = if (j < nInformative) {
        // offset by the row's class cluster center
        val center = (0 until nClasses).foldLeft(lit(0.0)) { (acc, c) =>
          when(col("y") === c, offsets(c)(j)).otherwise(acc)
        }
        noise + center
      } else noise
      df = df.withColumn(j.toString, feature)
    }
    for (i <- 1 to nSensitive) {
      df = df.withColumn(s"s$i",
        pmod(xxhash64(col("id"), lit(seed + 7 * i)), lit(2)).cast("int"))
    }
    df.select(((0 until nFeatures).map(j => col(j.toString)) ++
      (1 to nSensitive).map(i => col(s"s$i")) :+ col("y")): _*)
  }
}
