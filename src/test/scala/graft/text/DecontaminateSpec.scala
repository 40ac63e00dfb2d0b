package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // bench doc
    (1L, "alpha beta gamma delta epsilon zeta"),
    // shares the 5-gram "alpha beta gamma delta epsilon" -> contaminated
    (2L, "x alpha beta gamma delta epsilon y"),
    // shares words but no full 5-gram -> clean
    (3L, "alpha beta gamma q delta epsilon zeta w"),
    // disjoint -> clean
    (4L, "one two three four five six seven")
  ).toDF("doc_id", "text")

  private val bench = docs.where($"doc_id" === 1L)
  private val train = docs.where($"doc_id" =!= 1L)

  test("overlapReport flags only docs sharing a full n-gram, with counts") {
    val rep = Decontaminate.overlapReport(train, bench, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rep.toSeq == Seq((2L, 3L, 1L, 0.333333)))
  }

  test("removeContaminated drops exactly the flagged docs") {
    val clean = Decontaminate.removeContaminated(train, bench, "doc_id", "text", n = 5)
      .select($"doc_id").as[Long].collect().sorted
    assert(clean.toSeq == Seq(3L, 4L))
  }

  test("doc fully contained in a bench doc has frac 1.0") {
    val t2 = Seq((9L, "beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val rep = Decontaminate.overlapReport(t2, bench, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(rep.toSeq == Seq((9L, 1.0)))
  }

  private val longBench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog while seventeen " +
      "startled geese watch from the riverbank in complete astonished silence"))
    .toDF("doc_id", "text")

  test("fuzzyOverlapReport: exact copy scores 1.0; paraphrase-ish edit still flagged") {
    val train = Seq(
      // verbatim contamination
      (10L, "the quick brown fox jumps over the lazy dog while seventeen " +
        "startled geese watch from the riverbank in complete astonished silence"),
      // light edit: word swapped + suffix — low exact-n-gram overlap at
      // n=8 but high shingle jaccard
      (11L, "the quick brown fox leaps over the lazy dog while seventeen " +
        "startled geese watch from the riverbank in complete astonished silence today"),
      // unrelated
      (12L, "completely different content about distributed query engines " +
        "and their shuffle partitioning strategies at petabyte scale"))
      .toDF("doc_id", "text")
    for (portable <- Seq(false, true)) {
      val rep = Decontaminate.fuzzyOverlapReport(
          train, longBench, "doc_id", "text", threshold = 0.5, portable = portable)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(rep.map(_._1).toSeq === Seq(10L, 11L), s"portable=$portable")
      assert(rep.forall(_._2 == 100L))
      assert(rep(0)._3 === 1.0)
      assert(rep(1)._3 > 0.5 && rep(1)._3 < 1.0)
    }
  }

  test("fuzzyOverlapReport: bench bands and sets broadcast; corpus side has no self-join") {
    val train = Seq((10L, "some training document with words")).toDF("doc_id", "text")
    val plan = Decontaminate.fuzzyOverlapReport(
      train, longBench, "doc_id", "text").queryExecution.executedPlan.toString
    // two broadcast joins from the bench side + one from the candidate-id
    // prune; no sort-merge join anywhere in the operator
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
  }
}
