package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {

  test("sampleFraction: deterministic, repartition-stable, near the target rate") {
    import spark.implicits._
    val df = (0 until 10000).map(i => (i.toLong, s"d$i")).toDF("id", "payload")
    val a = Mixing.sampleFraction(df, "id", 0.3).select("id").collect().map(_.getLong(0)).toSet
    val b = Mixing.sampleFraction(df.repartition(17), "id", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b, "selection must be a pure function of id, not partitioning")
    // binomial(10000, 0.3): +-4 sigma band
    assert(a.size > 2800 && a.size < 3200, s"rate off: ${a.size}")
    // nested subsets are NOT implied (different thresholds, same hash): but
    // a higher fraction with the same salt must be a superset
    val c = Mixing.sampleFraction(df, "id", 0.6).select("id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(c), "same salt, higher fraction must keep every previously kept id")
  }

  test("edge fractions: 0 keeps nothing, 1 keeps everything") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, i)).toDF("id", "v")
    assert(Mixing.sampleFraction(df, "id", 0.0).count() === 0)
    assert(Mixing.sampleFraction(df, "id", 1.0).count() === 100)
  }

  test("weightedMix: per-source rates and decorrelated salts") {
    import spark.implicits._
    val df = (0 until 8000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "src")
    val mixed = Mixing.weightedMix(
      Seq(df.where($"src" === "a") -> 0.9, df.where($"src" === "b") -> 0.1),
      idCol = "id")
    val bySrc = mixed.groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("a") > 3400 && bySrc("a") < 3800, s"a rate off: ${bySrc("a")}")
    assert(bySrc("b") > 280 && bySrc("b") < 520, s"b rate off: ${bySrc("b")}")
    // no row duplicated, no row from outside its source filter
    assert(mixed.count() === mixed.distinct().count())
  }

  test("weightedMix upsamples w > 1 by replication plus fractional remainder") {
    import spark.implicits._
    val src = (0L until 1000L).map(i => (i, s"doc$i")).toDF("id", "text")
    val out = Mixing.weightedMix(Seq((src, 2.5)), "id")
    val n = out.count()
    // 2 exact copies + ~half the rows once more (binomial around 500)
    assert(n >= 2400 && n <= 2600, s"expected ~2500 rows for w=2.5, got $n")
    // every id appears at least twice, at most 3 times
    val freq = out.groupBy("id").count().agg(min("count"), max("count")).collect()(0)
    assert(freq.getLong(0) === 2L && freq.getLong(1) === 3L)
    // deterministic: same ids drawn again
    assert(Mixing.weightedMix(Seq((src, 2.5)), "id").count() === n)
  }

  test("assignSplit: fractions sum check, per-stratum proportions, exhaustive cover") {
    import spark.implicits._
    val df = (0 until 12000).map(i => (i.toLong, if (i % 3 == 0) "en" else "de")).toDF("id", "lang")
    val out = Mixing.assignSplit(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // every row labeled, no rows invented
    assert(out.count() === 12000)
    val byLang = out.groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // proportions hold WITHIN each stratum (hash uniform within any subset)
    Seq("en" -> 4000L, "de" -> 8000L).foreach { case (lang, n) =>
      val train = byLang((lang, "train")).toDouble / n
      assert(train > 0.77 && train < 0.83, s"$lang train rate $train")
      val testR = byLang((lang, "test")).toDouble / n
      assert(testR > 0.07 && testR < 0.13, s"$lang test rate $testR")
    }
    intercept[IllegalArgumentException] {
      Mixing.assignSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("capPerGroup keeps at most cap rows per group, deterministically") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "dom")
    val capped = Mixing.capPerGroup(df, "dom", "id", cap = 10)
    val sizes = capped.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ === 10L), s"got $sizes")
    // small groups pass through whole
    val small = Mixing.capPerGroup(df.where(col("id") < 9), "dom", "id", cap = 10)
    assert(small.count() === 9)
    // deterministic: same ids on a different partitioning
    val a = capped.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Mixing.capPerGroup(df.repartition(13), "dom", "id", cap = 10)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    intercept[IllegalArgumentException](Mixing.capPerGroup(df, "dom", "id", 0))
  }

  test("capPerGroup plan gets the map-side WindowGroupLimit rewrite") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, s"d${i % 4}")).toDF("id", "dom")
    val plan = Mixing.capPerGroup(df, "dom", "id", cap = 5)
      .queryExecution.executedPlan
    val nodes = graft.tools.PlanWalk.collectAll(plan)
    val groupLimits = nodes.filter(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowGroupLimitExec])
    // Partial (pre-shuffle) + Final — the cap must run BEFORE the exchange
    assert(groupLimits.size >= 2,
      s"expected partial+final WindowGroupLimitExec, plan:\n$plan")
  }

  test("no shuffle in the mixing plan: pure filters + union") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, i % 3)).toDF("id", "k")
    val plan = Mixing.weightedMix(Seq(df -> 0.5, df -> 0.2), "id")
      .queryExecution.executedPlan
    // PlanWalk sees through the AQE wrapper; a bare collect would be vacuous
    val nodes = graft.tools.PlanWalk.collectAll(plan)
    assert(nodes.length > 1, "plan walk must traverse the real plan")
    val exchanges = nodes.filter(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(exchanges.isEmpty, "mixing must not shuffle")
  }
}
