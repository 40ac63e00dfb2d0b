package graft.etl

import graft.SparkSpec

class StratifiedSpec extends SparkSpec {
  import spark.implicits._

  test("quotas: largest remainder sums exactly, each within 1 of proportion") {
    val counts = Seq(("a", 7L), ("b", 11L), ("c", 3L), ("d", 19L))
    val q = Stratified.quotas(counts, 10L).toMap
    assert(q.values.sum == 10L)
    counts.foreach { case (k, c) =>
      val exact = 10.0 * c / 40.0
      assert(math.abs(q(k) - exact) < 1.0, s"stratum $k quota ${q(k)} vs exact $exact")
    }
  }

  test("quotas tie-break: remainder desc then stratum asc") {
    // counts 1,1,1,1 with total 2: all remainders equal -> first two strata
    // in lexicographic order get the extra unit
    val q = Stratified.quotas(Seq(("b", 1L), ("d", 1L), ("a", 1L), ("c", 1L)), 2L).toMap
    assert(q == Map("a" -> 1L, "b" -> 1L, "c" -> 0L, "d" -> 0L))
  }

  test("quotas property sweep: 500 random allocations are exact and fair") {
    val rng = new scala.util.Random(97)
    (0 until 500).foreach { i =>
      val nStrata = rng.nextInt(8) + 1
      val counts = (0 until nStrata).map(j => (s"s$j", rng.nextInt(1000) + 1L))
      val totalRows = counts.map(_._2).sum
      val total = rng.nextInt(totalRows.toInt) + 1L
      val q = Stratified.quotas(counts, total).toMap
      assert(q.values.sum == total, s"case $i: sum ${q.values.sum} != $total")
      counts.foreach { case (k, c) =>
        val exact = total.toDouble * c / totalRows
        assert(q(k) >= 0 && q(k) <= c, s"case $i: quota ${q(k)} outside [0, $c]")
        assert(math.abs(q(k) - exact) < 1.0, s"case $i: quota ${q(k)} vs exact $exact")
      }
    }
  }

  test("exactProportionalSample returns exactly N, proportional per stratum") {
    val df = (0L until 1000L).map(i => (i, s"s${i % 4}")).toDF("id", "stratum")
    val out = Stratified.exactProportionalSample(df, "stratum", "id", total = 100L)
    val byStratum = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum.values.sum == 100L)
    assert(byStratum == Map("s0" -> 25L, "s1" -> 25L, "s2" -> 25L, "s3" -> 25L))
  }

  test("NULL strata are sampled like any other stratum, exact total held") {
    val df = (0L until 1000L)
      .map(i => (i, if (i % 4 == 3) null else s"s${i % 4}"))
      .toDF("id", "stratum")
    val out = Stratified.exactProportionalSample(df, "stratum", "id", total = 100L)
    assert(out.count() === 100L)
    val nullRows = out.where(out("stratum").isNull).count()
    assert(nullRows === 25L, s"null stratum drew $nullRows of its 25-row quota")
  }

  test("selection is deterministic and schema-preserving") {
    val df = (0L until 500L).map(i => (i, s"s${i % 3}", i * 2.5)).toDF("id", "stratum", "x")
    val a = Stratified.exactProportionalSample(df, "stratum", "id", 50L)
    val b = Stratified.exactProportionalSample(df, "stratum", "id", 50L)
    assert(a.columns.toSeq == df.columns.toSeq)
    assert(a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet)
    assert(a.count() == 50L)
  }

  test("salt buckets do not change the selected set") {
    val df = (0L until 300L).map(i => (i, s"s${i % 2}")).toDF("id", "stratum")
    val a = Stratified.exactProportionalSample(df, "stratum", "id", 40L, saltBuckets = 1)
      .select($"id").as[Long].collect().sorted.toSeq
    val b = Stratified.exactProportionalSample(df, "stratum", "id", 40L, saltBuckets = 32)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("temperatureQuotas: alpha = 1 equals proportional quotas") {
    val rng = new scala.util.Random(7)
    (0 until 100).foreach { _ =>
      val counts = (0 until 1 + rng.nextInt(8)).map(i =>
        (s"s$i", 1L + rng.nextInt(5000))).toSeq
      val total = 1L + rng.nextInt(counts.map(_._2).sum.toInt)
      // alpha = 1: weights = c * scale, identical shares to raw counts
      assert(Stratified.temperatureQuotas(counts, total, 1.0, 1L << 20) ===
        Stratified.quotas(counts, total))
    }
  }

  test("temperatureQuotas: alpha = 0.5 flattens — rare strata gain, capped at availability") {
    val counts = Seq(("big", 9000L), ("mid", 900L), ("rare", 100L))
    val prop = Stratified.quotas(counts, 500L).toMap
    val temp = Stratified.temperatureQuotas(counts, 500L, 0.5, 1L << 20).toMap
    assert(temp("rare") > prop("rare"))
    assert(temp("big") < prop("big"))
    assert(temp.values.sum === 500L) // no cap hit here
    // a tiny stratum up-weighted past its size is capped, total shrinks
    val capped = Stratified.temperatureQuotas(
      Seq(("big", 100000L), ("tiny", 4L)), 5000L, 0.5, 1L << 20).toMap
    assert(capped("tiny") === 4L)
    assert(capped.values.sum < 5000L)
  }

  test("exactTemperatureSample lands exactly on the temperature quotas") {
    val df = ((0L until 800L).map(i => (i, "big")) ++
      (800L until 880L).map(i => (i, "mid")) ++
      (880L until 890L).map(i => (i, "rare"))).toDF("id", "stratum")
    val expected = Stratified.temperatureQuotas(
      Seq(("big", 800L), ("mid", 80L), ("rare", 10L)), 100L, 0.5, 1L << 20).toMap
    val got = Stratified.exactTemperatureSample(df, "stratum", "id", 100L)
      .groupBy($"stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected.filter(_._2 > 0))
    // deterministic across salt buckets, like the proportional path
    val a = Stratified.exactTemperatureSample(df, "stratum", "id", 100L, saltBuckets = 1)
      .select($"id").as[Long].collect().sorted.toSeq
    val b = Stratified.exactTemperatureSample(df, "stratum", "id", 100L, saltBuckets = 16)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }
}
