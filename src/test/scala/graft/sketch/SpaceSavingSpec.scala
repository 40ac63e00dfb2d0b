package graft.sketch

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def entries(rows: Seq[Row]): Seq[(String, Long, Long)] =
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  private def summarize(terms: Seq[String], capacity: Int, parts: Int = 4): Seq[(String, Long, Long)] = {
    val df = terms.toDF("t").repartition(parts)
    val sk = df.agg(SpaceSaving.summary(col("t"), capacity).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.count"), col("e.err"))
      .collect()
    entries(sk.toSeq)
  }

  test("no-eviction regime: exact counts, zero err, (count desc, term) order") {
    val stream = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    val got = summarize(scala.util.Random.shuffle(stream), capacity = 10)
    assert(got === Seq(("a", 5L, 0L), ("b", 3L, 0L), ("c", 3L, 0L), ("d", 1L, 0L)))
  }

  test("eviction regime: SpaceSaving bounds hold against true counts") {
    // 4 heavy keys + 60 singletons through a capacity-8 sketch
    val heavy = Seq("h1" -> 50, "h2" -> 40, "h3" -> 30, "h4" -> 20)
    val light = (1 to 60).map(i => s"n$i" -> 1)
    val trueCounts = (heavy ++ light).toMap
    val stream = new scala.util.Random(7).shuffle(
      (heavy ++ light).flatMap { case (t, n) => Seq.fill(n)(t) })
    val got = summarize(stream, capacity = 8, parts = 1)
    assert(got.size === 8)
    got.foreach { case (t, c, e) =>
      val truth = trueCounts(t).toLong
      assert(c >= truth, s"$t overestimate invariant")
      assert(c - e <= truth, s"$t error-bound invariant")
    }
    // terms with true count above N/capacity (= 200/8 = 25) are
    // guaranteed tracked AND top-ranked: any spurious entry's count is
    // at most true + N/capacity ~ 26 < 30 <= the h1..h3 counts. h4 (20)
    // sits below the bound, so its presence is likely but not guaranteed.
    assert(got.take(3).map(_._1).toSet === Set("h1", "h2", "h3"))
  }

  test("multi-partition merge preserves the bounds (eviction on both sides)") {
    val heavy = Seq("h1" -> 80, "h2" -> 60, "h3" -> 40)
    val light = (1 to 100).map(i => s"n$i" -> 2)
    val trueCounts = (heavy ++ light).toMap
    val stream = new scala.util.Random(11).shuffle(
      (heavy ++ light).flatMap { case (t, n) => Seq.fill(n)(t) })
    val got = summarize(stream, capacity = 12, parts = 8)
    got.foreach { case (t, c, e) =>
      val truth = trueCounts(t).toLong
      assert(c >= truth, s"$t overestimate invariant (c=$c true=$truth)")
      assert(c - e <= truth, s"$t error-bound invariant (c=$c e=$e true=$truth)")
    }
    assert(got.take(3).map(_._1).toSet === Set("h1", "h2", "h3"))
  }

  test("array<string> input adds every element without an explode") {
    val df = Seq(Seq("x", "y", "x"), Seq("x"), Seq.empty[String])
      .toDF("ts")
    val got = entries(df.agg(SpaceSaving.summary(col("ts"), 8).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.count"), col("e.err")).collect().toSeq)
    assert(got === Seq(("x", 3L, 0L), ("y", 1L, 0L)))
  }

  test("null keys and null arrays are skipped") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("t")
    val got = entries(df.agg(SpaceSaving.summary(col("t"), 4).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.count"), col("e.err")).collect().toSeq)
    assert(got === Seq(("a", 2L, 0L)))
  }

  test("grouped sketches stay per-group") {
    val df = Seq(("g1", "a"), ("g1", "a"), ("g2", "b")).toDF("g", "t")
    val got = df.groupBy("g")
      .agg(SpaceSaving.summary(col("t"), 4).as("sk"))
      .select(col("g"), explode(col("sk")).as("e"))
      .select(col("g"), col("e.term"), col("e.count"))
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("g1", "a", 2L), ("g2", "b", 1L)))
  }

  test("topK slices the summary head") {
    val df = (Seq.fill(9)("a") ++ Seq.fill(5)("b") ++ Seq("c")).toDF("t")
    val got = entries(df.agg(SpaceSaving.topK(
        SpaceSaving.summary(col("t"), 16), 2).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.count"), col("e.err")).collect().toSeq)
    assert(got === Seq(("a", 9L, 0L), ("b", 5L, 0L)))
  }

  test("total count is conserved while no buffer fills") {
    // sum of summary counts == stream length in the exact regime even
    // across merges (each element counted exactly once)
    val stream = (1 to 500).map(i => s"k${i % 37}")
    val got = summarize(stream, capacity = 64, parts = 8)
    assert(got.map(_._2).sum === 500L)
    assert(got.forall(_._3 == 0L))
  }
}
