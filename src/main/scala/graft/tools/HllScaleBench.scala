package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sketch.Hll

/** Decomposes q109's decade cost: the query carries an EXACT
  * count_distinct rider as its accuracy yardstick (one cube pass over
  * exploded shingle hashes — ~90 rows/doc through a distinct shuffle),
  * which a real 100 TB run would skip because the sketch exists
  * precisely to avoid it. This times the HLL surface alone
  * (shingle -> per-source sketch -> merge rollup -> estimate) so the
  * operator's own scaling is on record separately from the yardstick's.
  *
  *   runMain graft.tools.HllScaleBench [dir1 dir2 ...]
  */
object HllScaleBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/repo/testdata-sf1", "/root/repo/testdata-sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val p = 11
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count() // parquet footers + JVM warm, outside the timed region
      val t0 = System.nanoTime()
      val sh = docs.select(col("source"),
        TextFunctions.shingleHashSetPortable(col("text"), 5).as("hs"))
      val perSrc = sh.groupBy(col("source")).agg(Hll.sketch(col("hs"), p).as("reg"))
      val rows = perSrc.agg(Hll.mergeSketches(col("reg"), p).as("reg"))
        .select(Hll.estimate(col("reg"), p).as("est"))
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(String.format(java.util.Locale.ROOT,
        """{"dir":"%s", "global_est":%.1f, "sec":%.2f}""",
        dir, Double.box(rows(0).getDouble(0)), Double.box(sec)))
    }
    spark.stop()
  }
}
