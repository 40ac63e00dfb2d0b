package graft.etl

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-injection evidence for the salted plans (q46 salted join, q72
  * per-group cap): synthesize a key holding 50% of a 2M-row fact table and
  * measure the REAL per-task shuffle-read distribution with a listener.
  *
  * Assertions are on shuffle-read records per task — deterministic under
  * host contention, and the exact quantity salting/map-side-limiting
  * redistributes. Wall-clock task times are reported via `info()` but not
  * asserted (a roaming host stall would make a time assertion flaky; see
  * BENCHNOTES round-3 contention notes).
  */
class SkewInjectionSpec extends SparkSpec {

  /** Collects (stageId, shuffleReadRecords, durationMs) per finished task. */
  private final class TaskTap extends SparkListener {
    val tasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null && e.taskInfo != null)
        tasks.add((e.stageId, m.shuffleReadMetrics.recordsRead, e.taskInfo.duration))
    }
  }

  /** Run `action` with a listener attached; return the per-task
    * (records, durationMs) of the stage that read the most shuffle rows —
    * the join/window stage under test. Polls until the async listener bus
    * drains (stable task count).
    */
  private def shuffleStageTasks(action: => Unit): Seq[(Long, Long)] = {
    val tap = new TaskTap
    spark.sparkContext.addSparkListener(tap)
    try {
      action
      var last = -1
      val deadline = System.currentTimeMillis() + 15000
      while (tap.tasks.size() != last && System.currentTimeMillis() < deadline) {
        last = tap.tasks.size(); Thread.sleep(300)
      }
    } finally spark.sparkContext.removeSparkListener(tap)
    import scala.jdk.CollectionConverters._
    val byStage = tap.tasks.asScala.toSeq.groupBy(_._1)
    val (_, stage) = byStage.maxBy { case (_, ts) => ts.map(_._2).sum }
    stage.map(t => (t._2, t._3))
  }

  private def median(xs: Seq[Long]): Long = {
    val s = xs.sorted; s(s.length / 2)
  }

  // 2M-row fact table, one key ("hot") holding 50%, 100 cold keys.
  // (odd ids only for the cold side, so the modulo runs over id div 2 —
  // integer division, `/` on longs is a double and would render "k37.0" —
  // to hit all 100 residues)
  private def skewedFact(s: org.apache.spark.sql.SparkSession): DataFrame =
    s.range(0, 2000000).select(
      when(col("id") % 2 === 0, lit("hot"))
        .otherwise(concat(lit("k"), (col("id") / 2).cast("long") % 100)).as("key"),
      col("id").as("v"))

  test("q46 salted join: hot-key tasks stay bounded where the plain shuffle join concentrates") {
    // fresh SQLConf (shared SparkContext): broadcast off so both joins
    // actually shuffle — saltedEquiJoin targets the can't-broadcast regime
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "false") // isolate OUR mitigation
    // the suite default (4) leaves no room to spread 16 salt buckets —
    // use the production partition count so the measurement is honest
    s.conf.set("spark.sql.shuffle.partitions", "32")
    // AQE's coalescer re-packs BOTH joins into equal ~64MB chunks, making
    // per-task records measure the coalescer rather than the salt; at real
    // scale partitions are already at target size and coalescing cannot
    // split the hot key's single partition anyway — disable to expose the
    // raw distribution the salt produces
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val left = skewedFact(s)
    val right = s.range(0, 101).select(
      when(col("id") === 100, lit("hot"))
        .otherwise(concat(lit("k"), col("id") % 100)).as("key"),
      (col("id") * 10).as("dim"))
    // dedupe right keys (k0..k99 + hot): build exact dim table
    val dim = right.dropDuplicates("key")

    val plain = left.join(dim, Seq("key"))
    // saltBuckets well above the partition count: with buckets ~= partitions
    // the balls-into-bins lumpiness puts several hot sub-keys in one
    // partition (measured: 16 buckets / 32 partitions left one task at 4.6x
    // the 1-bucket share); 2x+ oversubscription smooths the assignment
    val salted = SkewJoin.saltedEquiJoin(left, dim, Seq("key"), saltBuckets = 64)

    // identical results first (the q46 oracle contract)
    val expected = 2000000L
    assert(salted.count() === expected) // forces one counted run

    val plainTasks = shuffleStageTasks(plain.write.format("noop").mode("overwrite").save())
    val saltedTasks = shuffleStageTasks(salted.write.format("noop").mode("overwrite").save())

    val pRecs = plainTasks.map(_._1).filter(_ > 0)
    val sRecs = saltedTasks.map(_._1).filter(_ > 0)
    info(s"plain  join tasks: n=${pRecs.length} max=${pRecs.max} median=${median(pRecs)} " +
      s"maxMs=${plainTasks.map(_._2).max}")
    info(s"salted join tasks: n=${sRecs.length} max=${sRecs.max} median=${median(sRecs)} " +
      s"maxMs=${saltedTasks.map(_._2).max}")

    // the plain join funnels the hot key (1M rows) into ONE task
    assert(pRecs.max >= 1000000L, s"fixture not skewed enough: max=${pRecs.max}")
    // the salted join spreads it: no task reads more than 4x the median
    assert(sRecs.max <= 4 * median(sRecs),
      s"salted max ${sRecs.max} > 4x median ${median(sRecs)}")
    // and the worst salted task carries a small fraction of the hot key
    assert(sRecs.max <= pRecs.max / 4,
      s"salted max ${sRecs.max} not materially below plain max ${pRecs.max}")
  }

  test("q46 salted join under AQE: the coalescer does not degrade the salted plan") {
    // Companion to the AQE-off leg above (which isolates the salting from
    // the coalescer). This leg is the production configuration: AQE ON,
    // partition coalescing ON — only AQE's own skew-join mitigation stays
    // off so the measurement attributes the bound to OUR salt, not to
    // Spark's runtime splitter. The property: the coalescer may re-pack
    // small post-shuffle partitions, but it can never UNDO the salt (it
    // only merges, never splits), so the per-task max/median bound holds
    // in the config users actually run.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "32")
    // the default 64 MB advisory target would swallow this whole ~40 MB toy
    // shuffle into a handful of tasks and the measurement would read the
    // pack size, not the salt; 1 MB keeps the target-to-data ratio roughly
    // what 64 MB is to a production shuffle
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    val left = skewedFact(s)
    val dim = s.range(0, 101).select(
      when(col("id") === 100, lit("hot"))
        .otherwise(concat(lit("k"), col("id") % 100)).as("key"),
      (col("id") * 10).as("dim")).dropDuplicates("key")

    val plain = left.join(dim, Seq("key"))
    val salted = SkewJoin.saltedEquiJoin(left, dim, Seq("key"), saltBuckets = 64)
    assert(salted.count() === 2000000L)

    val plainTasks = shuffleStageTasks(plain.write.format("noop").mode("overwrite").save())
    val saltedTasks = shuffleStageTasks(salted.write.format("noop").mode("overwrite").save())
    val pRecs = plainTasks.map(_._1).filter(_ > 0)
    val sRecs = saltedTasks.map(_._1).filter(_ > 0)
    info(s"AQE-on plain  join tasks: n=${pRecs.length} max=${pRecs.max} median=${median(pRecs)}")
    info(s"AQE-on salted join tasks: n=${sRecs.length} max=${sRecs.max} median=${median(sRecs)}")

    // AQE coalescing alone cannot fix the skew: merges never split the hot
    // key's partition, so the plain join still funnels 1M rows to one task
    assert(pRecs.max >= 1000000L, s"fixture not skewed enough under AQE: max=${pRecs.max}")
    // and it does not degrade the salt: with 64 buckets >= 2x partitions the
    // coalesced salted tasks stay within 2x of the median (the brief's rule)
    assert(sRecs.max <= 2 * median(sRecs),
      s"AQE-on salted max ${sRecs.max} > 2x median ${median(sRecs)}")
    assert(sRecs.max <= pRecs.max / 4,
      s"AQE-on salted max ${sRecs.max} not materially below plain max ${pRecs.max}")
  }

  test("q72 per-group cap: map-side WindowGroupLimit keeps the hot group's shuffle bounded") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "32")
    val fact = skewedFact(s).withColumn("text", concat(lit("doc "), col("v")))
    val cap = 100

    val capped = Mixing.capPerGroup(fact, "key", "v", cap)
    val tasks = shuffleStageTasks(capped.write.format("noop").mode("overwrite").save())

    // correctness: every group capped
    val counts = capped.groupBy("key").count()
    assert(counts.agg(max("count")).collect()(0).getLong(0) <= cap)
    assert(counts.count() === 101L) // hot + k0..k99

    val recs = tasks.map(_._1).filter(_ > 0)
    info(s"cap window tasks: n=${recs.length} max=${recs.max} median=${median(recs)} " +
      s"maxMs=${tasks.map(_._2).max}")
    // Without the map-side limit the hot group's 1M rows shuffle to one
    // task. With it, each map task forwards at most `cap` rows per group,
    // so the WHOLE shuffle is bounded by maps x cap x groups — so small
    // that AQE rightly coalesces it into few tasks (a per-task spread
    // assertion would measure the coalescer, not the limit; the volume
    // bound is the property that survives at 100 TB).
    val mapTasks = fact.rdd.getNumPartitions.toLong
    assert(recs.sum <= mapTasks * cap * 101 * 2,
      s"total shuffle ${recs.sum} not bounded by maps($mapTasks) x cap x groups")
    // vs the unlimited plan: the hot group alone would shuffle 1M rows
    assert(recs.sum <= 200000L,
      s"shuffle ${recs.sum} rows — map-side WindowGroupLimit not applied")
  }

  // one viral boilerplate line shared by EVERY doc: its 8-gram is a single
  // hot key holding ~half of all positional gram rows (each doc contributes
  // one unique-prefix gram + one viral gram)
  private def viralCorpus(s: org.apache.spark.sql.SparkSession, nDocs: Long): DataFrame =
    s.range(0, nDocs).select(col("id"),
      concat(lit("u"), col("id"),
        lit(" subscribe to our newsletter for the latest updates")).as("text"))

  test("q84 span-dedup gram join: viral-gram tasks stay bounded under salting") {
    // the can't-broadcast regime: at 100 TB the dup-gram set exceeds any
    // broadcast threshold, so the gram join shuffles the position side by
    // gram hash — and one viral gram's positions all share one key
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "false") // isolate OUR salt
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "32")

    // identical spans first, salted vs unsalted, on a collect-sized corpus
    val small = viralCorpus(s, 3000)
    def spans(salt: Int): Seq[(Long, Long, Long)] =
      graft.dedup.SpanDedup.duplicatedSpans(small, "id", "text",
          n = 8, minDocs = 2, gramSaltBuckets = salt)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
    assert(spans(64) === spans(1), "salting changed the span output")

    // several stages read ~|pos| rows here (the (g,id) distinct, the gram
    // join, the island window), so the bound is asserted over EVERY heavy
    // shuffle stage, not just the largest — the skew could hide in any
    val big = viralCorpus(s, 400000)
    def runStages(salt: Int): Map[Int, Seq[Long]] = {
      val tap = new TaskTap
      s.sparkContext.addSparkListener(tap)
      try {
        graft.dedup.SpanDedup.duplicatedSpans(big, "id", "text",
            n = 8, minDocs = 2, gramSaltBuckets = salt)
          .write.format("noop").mode("overwrite").save()
        var last = -1
        val deadline = System.currentTimeMillis() + 15000
        while (tap.tasks.size() != last && System.currentTimeMillis() < deadline) {
          last = tap.tasks.size(); Thread.sleep(300)
        }
      } finally s.sparkContext.removeSparkListener(tap)
      import scala.jdk.CollectionConverters._
      tap.tasks.asScala.toSeq.groupBy(_._1)
        .map { case (st, ts) => (st, ts.map(_._2).filter(_ > 0)) }
        .filter(_._2.nonEmpty)
    }
    val plain = runStages(1)
    val salted = runStages(64)
    val plainWorst = plain.values.map(_.max).max
    val saltedWorst = salted.values.map(_.max).max
    plain.foreach { case (st, recs) =>
      info(s"plain  stage $st: n=${recs.length} max=${recs.max} median=${median(recs)}") }
    salted.foreach { case (st, recs) =>
      info(s"salted stage $st: n=${recs.length} max=${recs.max} median=${median(recs)}") }
    // unsalted: the viral gram funnels its 400k positions into one task
    assert(plainWorst >= 300000L, s"fixture not skewed enough: worst=$plainWorst")
    // salted: in every heavy shuffle stage no task reads more than 4x its
    // stage median, and the worst task anywhere carries only a fraction
    // of the viral gram
    salted.filter(_._2.sum >= 100000L).foreach { case (st, recs) =>
      assert(recs.max <= 4 * median(recs),
        s"salted stage $st max ${recs.max} > 4x median ${median(recs)}")
    }
    assert(saltedWorst <= plainWorst / 4,
      s"salted worst $saltedWorst not materially below plain worst $plainWorst")
  }
}
