package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  // a 12-token "quote" embedded whole inside a much longer host doc:
  // the modality symmetric Jaccard misses
  private val quote =
    "the quick brown fox jumps over the lazy dog near the riverbank"
  private val host = (1 to 48).map(i => s"pre$i").mkString(" ") + " " +
    quote + " " + (1 to 48).map(i => s"post$i").mkString(" ")

  test("doc-inside-doc: containment ~1 where Jaccard is near zero") {
    val df = Seq((1L, quote), (2L, host), (3L, "totally unrelated words here again and again and again"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text",
        n = 5, blockN = 8, minContainment = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(out.length === 1)
    val (a, b, contAinB, contBinA, jac) = out(0)
    assert((a, b) === ((1L, 2L)))
    assert(contAinB === 1.0, "every quote n-gram occurs in the host")
    assert(contBinA < 0.2 && jac < 0.2,
      s"host-in-quote and jaccard should be small: $contBinA, $jac")
  }

  test("threshold filters: raising minContainment past the signal drops the pair") {
    val df = Seq((1L, quote), (2L, host)).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(df, "doc_id", "text", minContainment = 1.0).count() === 1)
    // host-in-quote direction is far below 1.0 but the max direction is
    // exactly 1.0 -> still kept; a doc pair sharing only the block
    // 8-gram but fewer 5-grams would drop (covered by the q96 oracle)
  }

  test("identical docs: both directions and jaccard are exactly 1") {
    val df = Seq((1L, quote), (2L, quote)).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(df, "doc_id", "text").collect()(0)
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4)) === ((1.0, 1.0, 1.0)))
  }

  test("docs shorter than the block size never become candidates") {
    val df = Seq((1L, "short one"), (2L, "short one")).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(df, "doc_id", "text").count() === 0)
  }
}
