package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventPipelineSpec extends SparkSpec {

  test("hourlyAggregates batch/stream parity: same function, same results as q15 shape") {
    import spark.implicits._
    val events = Seq(
      ("2024-01-01 10:05:00", "click", 1L, 2.0, "{}"),
      ("2024-01-01 10:45:00", "click", 2L, 3.0, "{}"),
      ("2024-01-01 11:05:00", "click", 1L, 5.0, "{}"),
      ("2024-01-01 10:30:00", "view", 3L, 1.0, "{}")
    ).toDF("ts", "event_type", "user_id", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = EventPipeline.hourlyAggregates(events)
      .orderBy("hour_start", "event_type").collect()
    assert(out.length === 3)
    assert(out(0).getLong(2) === 2L) // 10:00 clicks
    assert(out(0).getDouble(3) === 5.0)
  }

  test("streaming end-to-end: file source -> watermarked agg -> memory sink") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    Seq(
      ("2024-01-01 10:05:00", "click", 1L, 2.0, "{}"),
      ("2024-01-01 10:45:00", "click", 2L, 3.0, "{}"),
      ("2024-01-01 11:05:00", "view", 1L, 5.0, "{}")
    ).toDF("ts", "event_type", "user_id", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("overwrite").parquet(dir)

    val q = EventPipeline.start(spark, dir, queryName = "t_hourly", checkpointDir = ckpt)
    q.awaitTermination(60000)
    val result = spark.sql("SELECT * FROM t_hourly ORDER BY hour_start, event_type").collect()
    assert(result.length === 2)
    assert(result(0).getString(1) === "click")
    assert(result(0).getLong(2) === 2L)
  }

  test("sessionize splits on inactivity gaps (batch execution of the stateful operator)") {
    import spark.implicits._
    // user 1: events at t=0,10,20 then 100,110 (gap 80 > 50) -> one closed
    // session (3 events), one open (unemitted). user 2: single open session.
    val events = Seq(
      (1L, 0L, 1.0), (1L, 10L, 1.0), (1L, 20L, 1.0),
      (1L, 100L, 2.0), (1L, 110L, 2.0),
      (2L, 5L, 9.0)
    ).toDS()
    val closed = EventPipeline.sessionize(events, gapMs = 50L).collect()
    assert(closed.length === 1)
    assert(closed(0).userId === 1L)
    assert(closed(0).nEvents === 3L)
    assert(closed(0).totalValue === 3.0)
    assert(closed(0).startMs === 0L && closed(0).endMs === 20L)
  }
}
