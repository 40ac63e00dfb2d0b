package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    // target-flavored docs: heavy on "model training data"
    (1L, "en", "model training data model training"),
    (2L, "en", "training data for the model"),
    (3L, "en", "model data training pipeline"),
    // raw-only flavor: disjoint vocabulary
    (4L, "de", "zug bahnhof fahrplan zug"),
    (5L, "de", "bahnhof fahrplan gleis zug"),
    (6L, "fr", "gare train quai horaire")
  ).toDF("doc_id", "lang", "text")

  private def weights(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    Dsir.importanceWeights(df, "doc_id", "text", col("lang") === "en")
      .select("doc_id", "dsir_logw").as[(Long, Double)].collect().toMap

  test("target-flavored documents outscore raw-only ones") {
    val w = weights(corpus)
    val targetish = Seq(1L, 2L, 3L).map(w)
    val rawish = Seq(4L, 5L, 6L).map(w)
    assert(targetish.min > rawish.max,
      s"every target doc should outrank every non-target doc: $w")
  }

  test("scores are partitioning-invariant") {
    val w1 = weights(corpus.repartition(1))
    val w8 = weights(corpus.repartition(8))
    assert(w1 === w8)
  }

  test("n_features counts unigrams plus bigrams") {
    val df = Seq((1L, "en", "a b c")).toDF("doc_id", "lang", "text")
    val n = Dsir.importanceWeights(df, "doc_id", "text", col("lang") === "en")
      .select("n_features").as[Long].head()
    assert(n === 5L) // 3 unigrams + 2 bigrams
  }

  test("feature-less documents are dropped, not scored") {
    val df = Seq((1L, "en", "a b"), (2L, "en", "!!! ???"), (3L, "en", ""))
      .toDF("doc_id", "lang", "text")
    val ids = Dsir.importanceWeights(df, "doc_id", "text", col("lang") === "en")
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L))
  }

  test("an all-target corpus gives every doc weight ~0") {
    // p_target == p_raw for every bucket when the target IS the corpus,
    // so each feature contributes ln((tb+1)/(t+B) / ((rb+1)/(r+B))) with
    // tb == rb and t == r -> exactly 0
    val df = Seq((1L, "en", "x y z"), (2L, "en", "x z y x"))
      .toDF("doc_id", "lang", "text")
    val w = weights(df)
    assert(w.values.forall(v => math.abs(v) < 1e-9), s"expected ~0 weights: $w")
  }

  test("an empty target subset still scores (pure smoothing ratio)") {
    val df = Seq((1L, "de", "x y"), (2L, "fr", "y z"))
      .toDF("doc_id", "lang", "text")
    val w = weights(df)
    // with no target docs every ratio is ln((1/(0+B)) / ((rb+1)/(r+B))):
    // finite, negative for every observed bucket
    assert(w.size === 2 && w.values.forall(v => v < 0.0), s"$w")
  }

  test("scoring new data against a frozen histogram hits unseen buckets safely") {
    // importanceWeights computes the histogram from df itself, so route
    // through the two-arg path: a doc whose features never occurred in
    // the corpus must still get a finite weight (the unseen-bucket
    // default ratio), not an error — here the corpus is tiny so most of
    // the 1024 buckets are unseen, and a one-off vocabulary still scores
    val df = Seq((1L, "en", "alpha beta"), (2L, "de", "totally disjoint words here"))
      .toDF("doc_id", "lang", "text")
    val w = weights(df)
    assert(w.size === 2 && w.values.forall(v => !v.isNaN && !v.isInfinite))
  }
}
