package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, window: Int, stride: Int): Seq[(Long, Long, String)] =
    Chunker.chunkPassages(
        Seq((1L, text)).toDF("id", "txt"), "id", "txt", window, stride)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq

  test("exact layout: overlap, short final chunk, stop at end") {
    // 10 tokens, window 4, stride 3 -> starts 0,3,6 and stop: chunk at 6
    // reaches token 10 == n, so nChunks = 1 + ceil((10-4)/3) = 3
    val toks = (1 to 10).map(i => s"t$i").mkString(" ")
    assert(chunksOf(toks, 4, 3) === Seq(
      (0L, 4L, "t1 t2 t3 t4"),
      (1L, 4L, "t4 t5 t6 t7"),
      (2L, 4L, "t7 t8 t9 t10")))
  }

  test("final chunk shorter than window reports its true token count") {
    val toks = (1 to 9).map(i => s"t$i").mkString(" ")
    // starts 0,3,6: last covers t7..t9 = 3 tokens
    assert(chunksOf(toks, 4, 3).last === (2L, 3L, "t7 t8 t9"))
  }

  test("doc shorter than window yields exactly one chunk") {
    assert(chunksOf("a b", 16, 12) === Seq((0L, 2L, "a b")))
  }

  test("doc of exactly window tokens yields exactly one chunk") {
    val toks = (1 to 16).map(i => s"t$i").mkString(" ")
    val got = chunksOf(toks, 16, 12)
    assert(got.size === 1 && got.head._2 === 16L)
  }

  test("token-less and whitespace-only docs yield zero chunks") {
    assert(chunksOf("", 4, 3).isEmpty)
    assert(chunksOf("   \n\t  ", 4, 3).isEmpty)
  }

  test("mixed whitespace runs canonicalize to single spaces") {
    assert(chunksOf("a\t\tb\n c   d", 8, 8) === Seq((0L, 4L, "a b c d")))
  }

  test("stride == window tiles without overlap and covers every token") {
    val toks = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = chunksOf(toks, 3, 3)
    assert(got.map(_._3).mkString(" ") === toks)
    assert(got.map(_._2).sum === 10L)
  }

  test("every token position is covered at least once under overlap") {
    val toks = (1 to 57).map(i => s"t$i").mkString(" ")
    val got = chunksOf(toks, 16, 12)
    val covered = got.flatMap(_._3.split(" ")).toSet
    assert(covered === (1 to 57).map(i => s"t$i").toSet)
  }

  test("invalid window/stride are rejected") {
    val df = Seq((1L, "a")).toDF("id", "txt")
    intercept[IllegalArgumentException] {
      Chunker.chunkPassages(df, "id", "txt", 0, 1)
    }
    intercept[IllegalArgumentException] {
      Chunker.chunkPassages(df, "id", "txt", 4, 5)
    }
    intercept[IllegalArgumentException] {
      Chunker.chunkPassages(df, "id", "txt", 4, 0)
    }
  }

  test("null text yields zero chunks, not a crash") {
    val df = Seq((1L, null: String), (2L, "a b c")).toDF("id", "txt")
    val got = Chunker.chunkPassages(df, "id", "txt", 2, 1)
      .select("doc_id").as[Long].collect()
    assert(got.forall(_ == 2L) && got.nonEmpty)
  }
}
