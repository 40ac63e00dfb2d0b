package graft.dedup

import graft.SparkSpec

class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  // 2-word chunks keep the fixtures readable
  private def run(rows: Seq[(Long, String)], n: Int = 2) =
    ChunkDedup.dedupSpans(rows.toDF("doc_id", "text"), "doc_id", "text", n)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("repeated chunk survives only at its first (doc_id, idx) occurrence") {
    val out = run(Seq(
      (1L, "a b c d"),      // chunks: "a b", "c d"
      (2L, "a b x y"),      // "a b" repeated -> removed here
      (3L, "x y c d")))     // both chunks repeats of doc1/doc2
    assert(out(0) == ((1L, 2L, 2L, "a b c d")))
    assert(out(1) == ((2L, 2L, 1L, "x y")))
    assert(out(2) == ((3L, 2L, 0L, "")))
  }

  test("intra-document repeats collapse to the first position") {
    val out = run(Seq((7L, "p q p q p q")))
    assert(out(0) == ((7L, 3L, 1L, "p q")))
  }

  test("short tail chunk is its own unit and order is preserved") {
    val out = run(Seq(
      (1L, "a b c d e"),    // chunks: "a b", "c d", "e"
      (2L, "e f g")))       // chunks: "e f", "g" — "e" != "e f"
    assert(out(0) == ((1L, 3L, 3L, "a b c d e")))
    assert(out(1) == ((2L, 2L, 2L, "e f g")))
  }

  test("whitespace-only doc yields zero chunks and empty clean text") {
    val out = run(Seq((1L, "  "), (2L, "a b")))
    assert(out(0) == ((1L, 0L, 0L, "")))
    assert(out(1) == ((2L, 1L, 1L, "a b")))
  }
}
