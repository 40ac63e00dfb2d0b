package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], n: Int, minDocs: Int = 2)
      : Seq[(Long, Long, Long)] = {
    val df = docs.toDF("doc_id", "text").repartition(5)
    SpanDedup.duplicatedSpans(df, "doc_id", "text", n = n, minDocs = minDocs)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
  }

  test("a shared run longer than n merges into one maximal span") {
    // docs 1 and 2 share tokens "c d e f g h" (6 tokens); n=4 anchors at
    // doc-1 positions 2 and 3 and doc-2 positions 0 and 1 -> merged spans
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "c d e f g h x y"),
      (3L, "p q r s t u v w"))
    assert(spans(docs, n = 4) === Seq((1L, 2L, 8L), (2L, 0L, 6L)))
  }

  test("disjoint duplicated runs stay separate spans") {
    // "s1a s1b s1c s1d" duplicated at the start, "e1 e2 e3 e4" at the end,
    // with a long unique middle in each doc
    val docs = Seq(
      (1L, "s1a s1b s1c s1d m1 m2 m3 m4 m5 e1 e2 e3 e4"),
      (2L, "s1a s1b s1c s1d z1 z2 z3 z4 z5 e1 e2 e3 e4"))
    assert(spans(docs, n = 4) ===
      Seq((1L, 0L, 4L), (1L, 9L, 13L), (2L, 0L, 4L), (2L, 9L, 13L)))
  }

  test("abutting windows merge; gap of exactly one token does not") {
    // positions p and p+n abut ([p,p+n) + [p+n,p+2n) -> one span);
    // positions p and p+n+1 leave a 1-token hole -> two spans
    val abut = Seq(
      (1L, "a b c d e f x"),  // grams at 0..3 for n=3 vs doc2
      (2L, "a b c d e f y"))
    assert(spans(abut, n = 3) === Seq((1L, 0L, 6L), (2L, 0L, 6L)))
  }

  test("within-doc repetition alone is NOT a duplicated span (minDocs=2 is cross-doc)") {
    val docs = Seq(
      (1L, "r r r r r r r r u1 u2"),
      (2L, "only unique tokens here today friend"))
    assert(spans(docs, n = 4) === Seq.empty)
  }

  test("a gram shared by three docs with minDocs=3 survives; minDocs=4 kills it") {
    val docs = Seq(
      (1L, "k1 k2 k3 k4 a"),
      (2L, "k1 k2 k3 k4 b"),
      (3L, "k1 k2 k3 k4 c"),
      (4L, "x y z w v"))
    assert(spans(docs, n = 4, minDocs = 3) ===
      Seq((1L, 0L, 4L), (2L, 0L, 4L), (3L, 0L, 4L)))
    assert(spans(docs, n = 4, minDocs = 4) === Seq.empty)
  }

  test("whitespace runs and empty tokens follow the corpus word convention") {
    val docs = Seq(
      (1L, "  a   b\tc \n d e  "),
      (2L, "a b c d e"))
    assert(spans(docs, n = 5) === Seq((1L, 0L, 5L), (2L, 0L, 5L)))
  }

  test("docs shorter than n contribute nothing and do not crash") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, ""), (4L, null.asInstanceOf[String]))
    assert(spans(docs, n = 3) === Seq.empty)
  }

  test("portable md5-60 hash and xxhash64 find identical spans here") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "c d e f g h x y"))
    val df = docs.toDF("doc_id", "text")
    val viaXx = SpanDedup.duplicatedSpans(df, "doc_id", "text", n = 4)
      .orderBy("doc_id", "span_start").collect().toSeq
    val viaMd5 = SpanDedup.duplicatedSpans(df, "doc_id", "text", n = 4,
        hash = SpanDedup.portableHash60)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(viaXx === viaMd5)
  }

  test("stripSpans cuts exactly the spanned tokens; no-span docs keep all tokens") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "c d e f g h x y"),
      (3L, "an untouched document"))
    val df = docs.toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(df, "doc_id", "text", n = 4)
    val out = SpanDedup.stripSpans(df, "doc_id", "text", spans)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"))).toSeq
    // doc 1 loses tokens [2,8), doc 2 loses [0,6), doc 3 untouched
    assert(out === Seq((1L, "a b"), (2L, "x y"), (3L, "an untouched document")))
  }

  test("stripSpans policy hook: filtering the spans frame protects a canonical doc") {
    val docs = Seq((1L, "k1 k2 k3 k4"), (2L, "k1 k2 k3 k4")).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(docs, "doc_id", "text", n = 4)
      .where(col("doc_id") =!= 1L) // keep doc 1's occurrence (Lee-style)
    val out = SpanDedup.stripSpans(docs, "doc_id", "text", spans)
      .orderBy("doc_id").collect().map(_.getAs[String]("clean_text")).toSeq
    assert(out === Seq("k1 k2 k3 k4", ""))
  }

  test("spanStats reports zeros (not NULLs) for null-text documents") {
    val docs = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = SpanDedup.spanStats(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out(1) === ((2L, 0L, 0L, 0L, 0.0)))
  }

  test("removeSpans clamps Long span bounds beyond Int range instead of wrapping") {
    val df = Seq(("a b c", Seq((3000000000L, 3000000001L), (-9L, 1L))))
      .toDF("t", "sp")
      .select(graft.functions.TextFunctions.removeSpans(
        col("t"), col("sp").cast("array<struct<s:bigint,e:bigint>>")).as("c"))
    // the >Int.MaxValue span clamps to the token count (no effect);
    // [-9,1) covers token 0 only
    assert(df.collect()(0).getString(0) === "b c")
  }

  test("removeSpans kernel: overlaps, out-of-range clamps, whitespace normalization") {
    val df = Seq(("a  b\tc d   e", Seq((1L, 3L), (2L, 4L), (-5L, 1L), (4L, 99L))))
      .toDF("t", "sp")
      .select(graft.functions.TextFunctions.removeSpans(
        col("t"), col("sp").cast("array<struct<s:bigint,e:bigint>>")).as("c"))
    // tokens a b c d e; covered: [-5,1)->{0}, [1,3)->{1,2}, [2,4)->{2,3}, [4,99)->{4}
    assert(df.collect()(0).getString(0) === "")
    val df2 = Seq(("  x   y  z ", Seq((1L, 2L))))
      .toDF("t", "sp")
      .select(graft.functions.TextFunctions.removeSpans(
        col("t"), col("sp").cast("array<struct<s:bigint,e:bigint>>")).as("c"))
    assert(df2.collect()(0).getString(0) === "x z")
  }

  test("spanStats: counts, token totals and fraction; zero rows for clean docs") {
    val docs = Seq(
      (1L, "s1a s1b s1c s1d m1 m2 m3 m4 m5 e1 e2 e3 e4"),
      (2L, "s1a s1b s1c s1d z1 z2 z3 z4 z5 e1 e2 e3 e4"),
      (3L, "an entirely original document with no duplication at all"))
    val out = SpanDedup.spanStats(docs.toDF("doc_id", "text"), "doc_id", "text", n = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(out === Seq(
      (1L, 13L, 2L, 8L, 8.0 / 13),
      (2L, 13L, 2L, 8L, 8.0 / 13),
      (3L, 9L, 0L, 0L, 0.0)))
  }
}
