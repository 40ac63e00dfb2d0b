package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r12): does `repartitionByRange(key)` + `orderBy(key)` plan a
  * SINGLE exchange (the global sort's range exchange satisfied by the
  * explicit one), with the expensive projection evaluated AFTER the
  * exchange — so the sort's boundary-sample job evaluates only the cheap
  * scan, never the kernel chain? This is the cache-free alternative to
  * cacheBeforeSort: one kernel evaluation, no session cache.
  */
object RangeSortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    def kernel(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      length(col("text")).as("n_chars_computed"),
      round(TextFunctions.punctRatio(col("text")), 6).as("punct_ratio"),
      round(TextFunctions.stopwordRatio(col("text")), 6).as("stopword_ratio"))

    val plain = kernel(docs).orderBy(col("doc_id"))
    val ranged = kernel(docs.repartitionByRange(col("doc_id"))).orderBy(col("doc_id"))

    println("===== PLAIN orderBy =====")
    println(plain.queryExecution.executedPlan.toString.take(3000))
    println("===== repartitionByRange + orderBy =====")
    println(ranged.queryExecution.executedPlan.toString.take(3000))

    def time(label: String, f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to 3).foreach { p =>
      time(s"plain   pass$p", plain.write.format("noop").mode("overwrite").save())
      time(s"ranged  pass$p", ranged.write.format("noop").mode("overwrite").save())
      val cached = graft.etl.CacheTracker.persistTracked(kernel(docs))
      time(s"cached  pass$p", cached.orderBy(col("doc_id")).write.format("noop").mode("overwrite").save())
      graft.etl.CacheTracker.unpersistCaches(blocking = true)
    }
    // row-order equivalence: collect both and compare sequences
    val a = plain.collect().toSeq
    val b = ranged.collect().toSeq
    println(s"rows equal in order: ${a == b} (n=${a.size})")
    spark.stop()
  }
}
