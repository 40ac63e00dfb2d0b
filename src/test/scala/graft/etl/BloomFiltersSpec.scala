package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("antiJoin equals plain left_anti on long keys") {
    val corpus = (0L until 2000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val block = (0L until 2000L by 3).toDF("bk")
    val got = BloomFilters.antiJoin(corpus, "k", block, "bk", expectedItems = 1000L)
      .select($"k").as[Long].collect().sorted
    val want = corpus.join(block.withColumnRenamed("bk", "k"), Seq("k"), "left_anti")
      .select($"k").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq)
    assert(got.forall(_ % 3 != 0))
  }

  test("antiJoin equals plain left_anti on string keys") {
    val corpus = (0 until 500).map(i => (s"key-$i", i)).toDF("k", "v")
    val block = (0 until 500 by 7).map(i => s"key-$i").toDF("bk")
    val got = BloomFilters.antiJoin(corpus, "k", block, "bk", expectedItems = 100L)
      .select($"k").as[String].collect().sorted
    val want = corpus.join(block.withColumnRenamed("bk", "k"), Seq("k"), "left_anti")
      .select($"k").as[String].collect().sorted
    assert(got.toSeq == want.toSeq)
  }

  test("bloom probe has no false negatives and prunes most clean rows") {
    val block = (0L until 1000L).toDF("k")
    val bloom = BloomFilters.build(block, "k", expectedItems = 1000L, fpp = 0.01)
    // every inserted key must probe true
    assert((0L until 1000L).forall(bloom.mightContainLong))
    // disjoint keys: false-positive rate should be near fpp, far below 50%
    val probe = (1000000L until 1010000L).toDF("k")
      .where(BloomFilters.mightContain(bloom, $"k"))
      .count()
    assert(probe < 500, s"false-positive count $probe out of 10000 is way above fpp")
  }

  test("probe expression works for definitely-absent fast path") {
    val block = Seq("a", "b").toDF("k")
    val bloom = BloomFilters.build(block, "k", expectedItems = 10L, fpp = 0.01)
    val flags = Seq("a", "zzz-definitely-not").toDF("k")
      .select(BloomFilters.mightContain(bloom, $"k")).as[Boolean].collect()
    assert(flags(0))
    // 2 items at fpp 0.01 makes a false positive on this probe vanishingly
    // unlikely — asserting the absent key keeps this test from passing on
    // a constant-true probe regression
    assert(!flags(1), "definitely-absent key probed true")
  }
}
