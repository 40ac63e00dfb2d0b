package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramStatsSpec extends SparkSpec {

  test("topBigrams: hand-computed occurrence and document counts") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick fox the quick dog"),
      (1L, "THE QUICK fox"),
      (2L, "lone")
    ).toDF("id", "body")
    val out = NgramStats.topBigrams(docs, "id", "body", k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "the quick": doc0 x2 + doc1 x1 (case-folded) = 3 occ, 2 docs
    assert(out("the quick") === (3L, 2L))
    assert(out("quick fox") === (2L, 2L))
    assert(out("fox the") === (1L, 1L))
    assert(out("quick dog") === (1L, 1L))
    assert(out.size === 4, s"unexpected bigrams: ${out.keySet}")
  }

  test("topBigrams: k-cut ordered by occurrences then bigram") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a b"), // "a b" x3, "b a" x2
      (1L, "c d"),
      (2L, "b c")
    ).toDF("id", "body")
    val out = NgramStats.topBigrams(docs, "id", "body", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // counts: "a b"=3, "b a"=2, then ties at 1 resolve alphabetically
    assert(out.toSeq === Seq(("a b", 3L), ("b a", 2L), ("b c", 1L)))
  }

  test("topBigrams: top-k is TakeOrderedAndProject, not a full sort") {
    import spark.implicits._
    val docs = Seq((0L, "x y z")).toDF("id", "body")
    val plan = NgramStats.topBigrams(docs, "id", "body", k = 5)
      .queryExecution.executedPlan
    assert(graft.tools.PlanWalk.collectDeep(plan) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, "global top-k must be TakeOrderedAndProject")
    assert(graft.tools.PlanWalk.collectDeep(plan) {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.isEmpty, "no full sort of the vocabulary")
  }
}
