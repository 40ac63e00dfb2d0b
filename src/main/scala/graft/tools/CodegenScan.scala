package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev harness: run every declared query once (alphabetical, tiny sf)
  * with a stderr marker line before each, so codegen-fallback ERRORs in
  * the unified log attribute to the query that triggered them —
  * guide §7.2's "find the operator behind the plan warning" step in a
  * UI-less sandbox.
  *
  *   runMain graft.tools.CodegenScan [sfDir]
  */
object CodegenScan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"=== CODEGENSCAN $name")
      System.err.flush()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case t: Throwable => System.err.println(s"=== FAILED $name: $t") }
      // cross-query memory pressure changes which stages fall back —
      // exactly the signal this tool attributes; drain caches per query
      finally graft.etl.CacheTracker.unpersistCaches(blocking = true)
    }
    spark.stop()
  }
}
