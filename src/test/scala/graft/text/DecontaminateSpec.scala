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
}
