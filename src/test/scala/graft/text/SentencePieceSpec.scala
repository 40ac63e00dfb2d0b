package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SentencePieceSpec extends SparkSpec {
  import spark.implicits._

  private val W = "\u2581" // the SentencePiece word-start marker

  private def encode(model: SentencePiece.Model, s: String): Seq[String] =
    Seq(s).toDF("t")
      .select(SentencePiece.encodePieces(col("t"), model).as("p"))
      .collect()(0).getSeq[String](0)

  test("Viterbi picks the max-likelihood segmentation (hand-computed)") {
    val model = SentencePiece.Model(Seq(
      W + "ab" -> -1.0, W + "a" -> -1.5, "b" -> -1.5,
      W -> -3.0, "a" -> -3.0, "c" -> -4.0), fallbackLogProb = -20.0)
    // 'ab': [▁ab] = -1 beats [▁a, b] = -3 beats [▁, a, b] = -7.5
    assert(encode(model, "ab") === Seq(W + "ab"))
    // 'ac': [▁a, c] = -5.5 beats [▁, a, c] = -10
    assert(encode(model, "ac") === Seq(W + "a", "c"))
    // two words segment independently (split_by_whitespace)
    assert(encode(model, "ab ab") === Seq(W + "ab", W + "ab"))
  }

  test("Viterbi tie-break: equal scores go to the longest final piece") {
    val model = SentencePiece.Model(Seq(
      W + "x" -> -1.0, W -> -0.5, "x" -> -0.5), fallbackLogProb = -20.0)
    // [▁x] = -1.0 ties [▁, x] = -1.0 -> strict > keeps the earliest
    // split start, i.e. the LONGER final piece
    assert(encode(model, "x") === Seq(W + "x"))
  }

  test("char-fallback encodes out-of-vocabulary codepoints (total, lossless)") {
    val model = SentencePiece.Model(Seq(
      W -> -1.0, "a" -> -1.0), fallbackLogProb = -20.0)
    assert(encode(model, "aqa") === Seq(W, "a", "q", "a"))
    // astral codepoint survives as one fallback piece
    val got = encode(model, "a😀a")
    assert(got === Seq(W, "a", "😀", "a"))
  }

  test("training learns multi-char pieces on repetitive morphology") {
    val corpus = (0 until 50).map(i =>
      (i.toLong, "international internet interface internal interview"))
      .toDF("id", "body")
    val model = SentencePiece.train(corpus, "body", vocabSize = 40, pruneRounds = 6)
    val multi = model.pieces.map(_._1).filter(p => p.codePointCount(0, p.length) >= 4)
    assert(multi.nonEmpty, s"expected >= 4-char pieces in ${model.pieces.map(_._1)}")
    // the shared stem should be represented well enough that 'internet'
    // encodes into far fewer pieces than its 8 characters
    val n = encode(model, "internet").length
    assert(n <= 4, s"internet encoded into $n pieces")
    // probabilities are a distribution
    val z = model.pieces.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(z - 1.0) < 1e-6, s"sum of probs $z")
  }

  test("decode inverts encode up to whitespace normalization") {
    val corpus = Seq((0L, "hello world of subword units")).toDF("id", "body")
    val model = SentencePiece.train(corpus, "body", vocabSize = 60)
    Seq("hello world", "  hello   world  ", "units of hello", "zq unseen chars!")
      .foreach { s =>
        val got = SentencePiece.decode(encode(model, s))
        val want = s.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
        assert(got === want, s"round-trip of '$s'")
      }
  }

  test("training is deterministic across partitionings and vocab size binds") {
    val corpus = (0 until 60).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog $i"))
      .toDF("id", "body")
    val a = SentencePiece.train(corpus, "body", vocabSize = 50)
    val b = SentencePiece.train(corpus.repartition(7), "body", vocabSize = 50)
    assert(a.pieces === b.pieces)
    // singles always kept (coverage): every training codepoint encodable
    val singles = a.pieces.map(_._1).filter(p => p.codePointCount(0, p.length) == 1)
    assert(singles.contains("q") && singles.contains(W))
    // piece budget respected up to the always-kept singles
    assert(a.vocabSize <= math.max(50, singles.length))
  }

  test("a larger vocabulary never lengthens the training-corpus encoding") {
    val corpus = (0 until 40).map(i =>
      (i.toLong, "tokenization tokenizer tokens token untoken"))
      .toDF("id", "body")
    val counts = Seq(30, 45, 70).map { v =>
      val m = SentencePiece.train(corpus, "body", vocabSize = v, pruneRounds = 6)
      corpus.select(sum(SentencePiece.tokenCount(col("body"), m))).first().getLong(0)
    }
    counts.sliding(2).foreach { case Seq(x, y) =>
      assert(y <= x, s"counts $counts must be non-increasing")
    }
  }
}
