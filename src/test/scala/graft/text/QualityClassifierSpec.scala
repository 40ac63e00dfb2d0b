package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val goodWords = Seq("analysis", "evidence", "method", "result", "theory", "study")
  private val spamWords = Seq("winner", "click", "free", "prize", "buy", "casino")
  private val neutral = Seq("the", "a", "of", "and", "it", "is", "on", "in")

  private def doc(rng: scala.util.Random, marked: Seq[String]): String =
    (0 until 30).map { _ =>
      if (rng.nextDouble() < 0.3) marked(rng.nextInt(marked.length))
      else neutral(rng.nextInt(neutral.length))
    }.mkString(" ")

  private lazy val (trainDf, testDf) = {
    val rng = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      val positive = i % 2 == 0
      (i.toLong, doc(rng, if (positive) goodWords else spamWords), if (positive) 1.0 else 0.0)
    }
    val df = rows.toDF("id", "text", "label")
    (df.where($"id" % 5 =!= 0), df.where($"id" % 5 === 0))
  }

  test("held-out accuracy on separable corpora is high") {
    val model = QualityClassifier.train(trainDf, "text", "label")
    val scored = QualityClassifier.score(model, testDf)
    val acc = scored
      .select(when(($"quality_prob" >= 0.5) === ($"label" === 1.0), 1.0).otherwise(0.0).as("ok"))
      .agg(avg($"ok")).as[Double].head()
    assert(acc > 0.9, s"held-out accuracy $acc")
  }

  test("score preserves schema and bounds; filter keeps only high scorers") {
    val model = QualityClassifier.train(trainDf, "text", "label")
    val scored = QualityClassifier.score(model, testDf)
    assert(scored.columns.toSeq == Seq("id", "text", "label", "quality_prob"))
    val probs = scored.select($"quality_prob").as[Double].collect()
    assert(probs.forall(p => p >= 0.0 && p <= 1.0))
    val kept = QualityClassifier.filterByQuality(model, testDf, 0.5)
    assert(kept.columns.toSeq == testDf.columns.toSeq)
    val posRate = kept.select(avg($"label")).as[Double].head()
    assert(posRate > 0.9, s"kept set should be mostly positives, got $posRate")
  }
}
