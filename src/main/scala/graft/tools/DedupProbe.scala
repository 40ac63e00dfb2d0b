package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Diagnostic: MinHash band-bucket occupancy and candidate-pair volume
  * at a given scale — written while chasing the round-7 sf100 q23 disk
  * exhaustion (which survived the verify-side candidate-id prune, so
  * the blowup had to be in the banded join itself).
  *
  * Usage: runMain graft.tools.DedupProbe <dir> [maxBucketSize]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val maxBucket = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (kSh, bands, rpb) = (5, 8, 4)
    val sig = TextFunctions.minhashSignature(col("text"), kSh, bands * rpb, 42L)
    val withSig = docs.select(col("doc_id").as("id"), sig.as("sig"))
      .where(size(col("sig")) > 0)
    val bandKeys = explode(
      transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          xxhash64(slice(col("sig"), b * rpb + 1, lit(rpb)), b).as("bucket"))))
    val buckets = withSig.select(col("id"), bandKeys.as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bucket"))
    val occ = buckets.groupBy("band", "bucket").agg(count(lit(1)).as("c"))
      .where(col("c") > 1)
      .persist()
    val stats = occ.agg(
      count(lit(1)).as("n_buckets_gt1"),
      sum(col("c") * (col("c") - 1) / 2).as("pairs_uncapped"),
      sum(when(col("c") <= maxBucket, col("c") * (col("c") - 1) / 2)).as("pairs_capped"),
      max(col("c")).as("max_occ")).collect()(0)
    println(s"PROBE buckets>1=${stats.get(0)} pairs_uncapped=${stats.get(1)} " +
      s"pairs_within_cap_$maxBucket=${stats.get(2)} max_occ=${stats.get(3)}")
    occ.orderBy(col("c").desc).limit(20).collect()
      .foreach(r => println(s"PROBE top band=${r.get(0)} bucket=${r.get(1)} c=${r.get(2)}"))
    spark.stop()
  }
}
