package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Null propagation through every custom Catalyst expression: null in ->
  * null out (UnaryExpression/BinaryExpression default eval), in both
  * interpreted and codegen paths — a corpus always has null text rows
  * somewhere at 100 TB.
  */
class ExpressionNullSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq(Some("hello world"), None).toDF("t")
  }

  test("text expressions are null-safe") {
    val out = df.select(
      TextFunctions.minhashSignature(col("t"), 3, 8).as("mh"),
      TextFunctions.shingleHashSet(col("t"), 3).as("sh"),
      TextFunctions.simhash64(col("t")).as("sim"),
      TextFunctions.winnowingFingerprints(col("t")).as("win"),
      TextFunctions.langGuess(col("t")).as("lang"),
      TextFunctions.stopwordRatio(col("t")).as("stop"),
      TextFunctions.gopherCounters(col("t")).as("gc"),
      TextFunctions.dedupLines(col("t")).as("dl"))
      .collect()
    val nullRow = out(1)
    (0 until nullRow.length).foreach { i =>
      assert(nullRow.isNullAt(i), s"column $i should be null for null input")
    }
    val okRow = out(0)
    (0 until okRow.length).foreach(i =>
      assert(!okRow.isNullAt(i), s"column $i should be non-null for non-null input"))
  }

  test("vector expressions are null-safe") {
    import spark.implicits._
    val vdf = Seq(
      (Some(Array(1.0, 0.0)), Some(Array(0.0, 1.0))),
      (None, Some(Array(0.0, 1.0))),
      (Some(Array(1.0, 0.0)), None)
    ).toDF("a", "b")
    val out = vdf.select(
      graft.similarity.Similarity.dot(col("a"), col("b")).as("d"),
      graft.similarity.Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }

  test("dedup pipeline tolerates null text rows") {
    import spark.implicits._
    val docs = Seq((1L, Some("the quick brown fox jumps over the lazy dog")),
      (2L, Option.empty[String]),
      (3L, Some("the quick brown fox jumps over the lazy dog"))).toDF("doc_id", "text")
    // exact dedup: null fingerprints group together; no crash
    val out = Dedup.exact(docs, "text", "doc_id")
    assert(out.count() === 2) // dup pair collapsed; null row kept
  }

  private def Dedup = graft.dedup.Dedup
}
