package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev profiling harness: run ONE declared query with the bench's exact
  * session/config/noop-sink methodology and print a per-JOB time
  * breakdown (job id, duration, #tasks, the first line of the callsite)
  * so the expensive action inside a multi-job query is attributable —
  * guide §1's "decide whether the time is going to shuffle read /
  * compute / scheduler" step, in a UI-less sandbox.
  *
  *   runMain graft.tools.QBench <queryName> [sfDir] [passes]
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
    // A/B knob: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" overrides any of the above
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder = builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // per-job bookkeeping
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = e.stageInfos.lastOption.map(si =>
          si.name.take(60) + s" [${e.stageInfos.size} stages]").getOrElse("?")
        jobStart.put(e.jobId, (e.time, site))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stageTasks.put(si.stageId, (si.numTasks,
          si.taskMetrics.executorRunTime))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobStart.get(e.jobId)).foreach { case (t0, site) =>
          lines.add(f"job ${e.jobId}%3d  ${(e.time - t0) / 1000.0}%7.3f s  $site")
        }
      }
    })
    // warmup parity with Bench
    if (new java.io.File(s"$sfDir/lineitem.parquet").exists())
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    (1 to passes).foreach { p =>
      lines.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"== pass $p: $name $sec%.3f s")
      lines.forEach(l => println("   " + l))
      // cold-plan parity with Bench: drop tracked caches between passes
      graft.etl.CacheTracker.unpersistCaches(blocking = true)
    }
    spark.stop()
  }
}
