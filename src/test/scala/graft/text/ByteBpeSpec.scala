package graft.text

import graft.SparkSpec
import graft.functions.TextAlgo
import org.apache.spark.sql.functions._

class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  test("GPT-2 byte table: public facts (Ġ space, Ċ newline, printable identity, 256 distinct)") {
    assert(TextAlgo.Gpt2ByteToChar(' '.toInt) === 'Ġ') // Ġ — the GPT-2 space marker
    assert(TextAlgo.Gpt2ByteToChar('\n'.toInt) === 'Ċ') // Ċ
    assert(TextAlgo.Gpt2ByteToChar('!'.toInt) === '!')
    assert(TextAlgo.Gpt2ByteToChar('~'.toInt) === '~')
    assert(TextAlgo.Gpt2ByteToChar(0) === 'Ā') // byte 0 is the first remapped
    assert(TextAlgo.Gpt2ByteToChar(173) === 'Ń') // soft hyphen, the last remapped
    assert(TextAlgo.Gpt2ByteToChar.distinct.length === 256)
    (0 until 256).foreach { b =>
      assert(TextAlgo.Gpt2CharToByte(TextAlgo.Gpt2ByteToChar(b)) === b)
    }
  }

  test("GPT-2 pre-tokenizer: contractions, space attachment, whitespace donation") {
    def pt(s: String) = TextAlgo.gpt2PretokensRaw(s).toSeq
    assert(pt("Hello world!") === Seq("Hello", " world", "!"))
    assert(pt("don't stop") === Seq("don", "'t", " stop"))
    // a multi-space run donates its LAST space to the following word
    assert(pt("a  b") === Seq("a", " ", " b"))
    assert(pt("a   b") === Seq("a", "  ", " b"))
    // trailing whitespace (nothing follows) stays one run
    assert(pt("a  ") === Seq("a", "  "))
    assert(pt("x42 7") === Seq("x", "42", " 7")) // letters and digits split; digit run carries its space
    assert(pt("") === Seq.empty)
  }

  test("GPT-2 pre-tokenizer treats UNICODE whitespace as \\s (tiktoken parity)") {
    def pt(s: String) = TextAlgo.gpt2PretokensRaw(s).toSeq
    // U+00A0 (no-break space, common in web text) is \s under Python
    // regex: it must form a WHITESPACE run, not be absorbed into the
    // adjacent punctuation run (Java's default ASCII \s would yield
    // ".\u00A0" as one punct token here) — ADVICE round 10
    assert(pt("a.\u00A0b") === Seq("a", ".", "\u00A0", "b"))
    // a whitespace run of nbsp + space still donates its last space
    assert(pt("a\u00A0 b") === Seq("a", "\u00A0", " b"))
    // U+3000 (ideographic space) is whitespace too
    assert(pt("x\u3000.") === Seq("x", "\u3000", "."))
    // round-trip is unaffected: byte form still encodes losslessly
    val joined = pt("a.\u00A0b \u3000 done").mkString
    assert(joined === "a.\u00A0b \u3000 done")
  }

  test("byte-level training: hand-computed merges with the code-point tie-break") {
    // one doc "aaab aaab": pre-tokens "aaab" and " aaab" -> byte forms
    // "aaab" and "Ġaaab". Round 1: (a,a) count 4. Round 2: (aa,a) and
    // (a,b) tie at 2 -> "a" < "aa" code-point order, so (a,b) wins.
    // Round 3: (aa,ab) count 2.
    val docs = Seq((0L, "aaab aaab")).toDF("id", "body")
    val model = ByteBpe.train(docs, "body", numMerges = 3)
    assert(model.merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    // encoding under the trained model: "aaab" -> one merged token of
    // rank 2 (id 258); " aaab" -> [Ġ(base id), 258]
    val ids = docs.select(ByteBpe.encodeIds(lit("aaab aaab"), model).as("ids"))
      .collect()(0).getSeq[Long](0)
    val gId = model.vocabEntries.find(_._1 == "Ġ").get._2.toLong
    assert(ids === Seq(258L, gId, 258L))
  }

  test("id layout matches GPT-2's: '!' is id 0, merges from 256, specials last") {
    val docs = Seq((0L, "ab ab")).toDF("id", "body")
    val model = ByteBpe.train(docs, "body", numMerges = 1,
      specials = Seq("<|endoftext|>"))
    assert(model.vocabEntries.find(_._1 == "!").get._2 === 0)
    assert(model.merges === Seq(("a", "b")))
    assert(model.vocabEntries.find(_._1 == "ab").get._2 === 256)
    assert(model.vocabEntries.find(_._1 == "<|endoftext|>").get._2 === 257)
    assert(model.vocabSize === 258)
  }

  test("lossless round-trip on arbitrary unicode (no UNK by construction)") {
    val samples = Seq(
      "plain ascii text",
      "  leading spaces and\ttabs\nnewlines  ",
      "emoji 😀 and CJK 漢字 mixed with café",
      "punct!@#$%^&*(){}[]<>\"'",
      "\u00A0nbsp and zero​width",
      "")
    val model = ByteBpe.train(Seq((0L, "some training text here")).toDF("id", "body"),
      "body", numMerges = 4)
    samples.foreach { s =>
      val ids = Seq((0L, s)).toDF("id", "body")
        .select(ByteBpe.encodeIds(col("body"), model).as("ids"))
        .collect()(0).getSeq[Long](0)
      assert(ByteBpe.decode(ids, model) === s, s"round-trip of '$s'")
    }
  }

  test("special tokens are atomic and round-trip") {
    val model = ByteBpe.train(
      Seq((0L, "doc one"), (1L, "doc two")).toDF("id", "body"),
      "body", numMerges = 2, specials = Seq("<|endoftext|>", "<|pad|>"))
    val text = "first<|endoftext|>second<|pad|><|endoftext|>"
    val ids = Seq((0L, text)).toDF("id", "body")
      .select(ByteBpe.encodeIds(col("body"), model).as("ids"))
      .collect()(0).getSeq[Long](0)
    val eot = model.vocabEntries.find(_._1 == "<|endoftext|>").get._2.toLong
    val pad = model.vocabEntries.find(_._1 == "<|pad|>").get._2.toLong
    assert(ids.count(_ == eot) === 2)
    assert(ids.count(_ == pad) === 1)
    // the special never byte-splits: no '<' byte token adjacent runs
    assert(ByteBpe.decode(ids, model) === text)
  }

  test("token count is monotone non-increasing in the number of merges") {
    val corpus = (0 until 30).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog $i times"))
      .toDF("id", "body")
    val counts = Seq(0, 2, 8, 32, 64).map { m =>
      val model = ByteBpe.train(corpus, "body", numMerges = m)
      corpus.select(sum(ByteBpe.tokenCount(col("body"), model))).first().getLong(0)
    }
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"counts $counts must be non-increasing")
    }
    // and deterministic across partitionings
    val m32 = ByteBpe.train(corpus, "body", numMerges = 32)
    val m32b = ByteBpe.train(corpus.repartition(7), "body", numMerges = 32)
    assert(m32.merges === m32b.merges)
  }
}
