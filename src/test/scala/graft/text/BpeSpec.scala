package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // hand-computed golden (see comments): low x3, lower x1, lowest x1
  //   pairs: (l,o)=5 (o,w)=5 (w,e)=2 (e,r)=1 (e,s)=1 (s,t)=1
  //   m1: count-5 tie (l,o) vs (o,w) -> lex -> (l,o)
  //   m2: (lo,w)=5
  //   m3: (low,e)=2
  //   m4: count-1 tie -> lex min (lowe,r)
  private val corpus = Seq("low low low", "lower", "lowest")
  private val golden = Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r"))

  test("train matches the hand-computed golden, any partitioning") {
    for (parts <- Seq(1, 3, 7)) {
      val df = corpus.toDF("t").repartition(parts)
      assert(Bpe.train(df, "t", numMerges = 4) === golden, s"parts=$parts")
    }
  }

  test("training stops early when no pair remains") {
    val df = Seq("a b", "b a").toDF("t")
    // single-char words have no adjacent pairs at all
    assert(Bpe.train(df, "t", numMerges = 10) === Seq.empty)
  }

  test("encode applies merges greedily by rank; untrained words fall back to chars") {
    val out = Seq("lowest low banana")
      .toDF("t").select(Bpe.encode(col("t"), golden).as("tok"))
      .collect()(0).getAs[scala.collection.Seq[String]]("tok")
    // lowest: l o w e s t -> lo -> low -> lowe -> [lowe, s, t]
    // low -> [low]; banana: no merge applies -> chars
    assert(out === Seq("lowe", "s", "t", "low", "b", "a", "n", "a", "n", "a"))
  }

  test("zero merges tokenizes to code points (surrogate-pair safe)") {
    val out = Seq("ab c😀d") // includes an emoji (astral plane)
      .toDF("t").select(Bpe.encode(col("t"), Seq.empty).as("tok"))
      .collect()(0).getAs[scala.collection.Seq[String]]("tok")
    assert(out === Seq("a", "b", "c", "😀", "d"))
  }

  test("token count is monotone non-increasing in the number of merges") {
    val df = corpus.toDF("t")
    val all = Bpe.train(df, "t", numMerges = 8)
    val countsByK = (0 to all.length).map { k =>
      df.select(sum(Bpe.tokenCount(col("t"), all.take(k))).as("n"))
        .collect()(0).getLong(0)
    }
    assert(countsByK.zip(countsByK.tail).forall { case (a, b) => b <= a },
      countsByK.toString)
    // and each applied merge strictly reduces the training-corpus tokens
    assert(countsByK.last < countsByK.head)
  }

  test("minCount drops hapax words from training") {
    val df = Seq("xx xx xx", "qz").toDF("t")
    val merges = Bpe.train(df, "t", numMerges = 2, minCount = 2L)
    // only "xx" (count 3) survives the floor -> one (x,x) merge possible
    assert(merges === Seq(("x", "x")))
  }

  test("encode round-trip: concatenated tokens reproduce each word") {
    val df = corpus.toDF("t")
    val merges = Bpe.train(df, "t", numMerges = 4)
    val rows = Seq("lowest lower low", "unrelated words here")
      .toDF("t")
      .select(col("t"), Bpe.encode(col("t"), merges).as("tok"))
      .collect()
    rows.foreach { r =>
      val rebuilt = r.getAs[scala.collection.Seq[String]]("tok").mkString
      val squashed = r.getString(0).split("\\s+").filter(_.nonEmpty).mkString
      assert(rebuilt === squashed)
    }
  }

  // naive full-rescan reference (the pre-incremental algorithm) — the
  // incremental trainer must be bit-identical to it on every input
  private def naiveTrain(words: Array[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    def cmpCp(a: String, b: String): Int = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
    val syms = words.map { case (w, _) =>
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp)); i += Character.charCount(cp)
      }
      b
    }
    val counts = words.map(_._2)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pair = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for (w <- syms.indices; i <- 0 until syms(w).length - 1)
        pair((syms(w)(i), syms(w)(i + 1))) =
          pair.getOrElse((syms(w)(i), syms(w)(i + 1)), 0L) + counts(w)
      if (pair.isEmpty) done = true
      else {
        val best = pair.toSeq.minBy(identity)(Ordering.fromLessThan[((String, String), Long)] {
          case (((l1, r1), c1), ((l2, r2), c2)) =>
            c1 > c2 || (c1 == c2 && {
              val l = cmpCp(l1, l2); l < 0 || (l == 0 && cmpCp(r1, r2) < 0)
            })
        })._1
        out += best
        for (w <- syms.indices) {
          val s = syms(w); var i = 0
          while (i < s.length - 1) {
            if (s(i) == best._1 && s(i + 1) == best._2) { s(i) = best._1 + best._2; s.remove(i + 1) }
            i += 1
          }
        }
        round += 1
      }
    }
    out.toSeq
  }

  test("incremental trainer is bit-identical to the full-rescan reference (randomized)") {
    val rng = new scala.util.Random(20260814L)
    val alphabet = "abcdefgh"
    for (trial <- 0 until 20) {
      val nWords = 5 + rng.nextInt(60)
      val words = (0 until nWords).map { _ =>
        val len = 1 + rng.nextInt(10)
        (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
      }.distinct.map(w => (w, 1L + rng.nextInt(50).toLong)).toArray
      val k = 1 + rng.nextInt(40)
      val inc = Bpe.trainOnWordCounts(words.map(identity), k)
      val ref = naiveTrain(words.map { case (w, c) => (w, c) }, k)
      assert(inc === ref, s"trial=$trial k=$k words=${words.toSeq}")
    }
  }

  test("sf0.1 word table trains to exhaustion, identical to the reference") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val words = docs
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w").asc)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // k far beyond exhaustion: every word collapses to one symbol
    val inc = Bpe.trainOnWordCounts(words.map(identity), 100000)
    val ref = naiveTrain(words.map(identity), 100000)
    assert(inc === ref)
    // exhaustion bound: at most (total symbols - words) merges possible
    assert(inc.length <= words.map(_._1.length).sum - words.length)
    assert(inc.nonEmpty)
  }

  test("1000+ merges on a production-sized word table inside a seconds budget") {
    // the sf0.1 synthetic corpus has only 31 distinct words (~130 merges
    // to exhaustion), so the production-vocab wall-time claim is proven
    // on a synthesized 50k-word Zipf table instead — the regime the
    // incremental loop exists for (the full-rescan loop took minutes
    // here; the incremental one takes seconds)
    val rng = new scala.util.Random(42L)
    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    val words = (0 until 50000).map { i =>
      val len = 4 + rng.nextInt(12)
      val w = (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
      (w + i, (50000L / (i + 1)) + 1L) // suffix guarantees distinctness; Zipf counts
    }.toArray
    val t0 = System.nanoTime()
    val merges = Bpe.trainOnWordCounts(words, 1000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.length === 1000)
    info(f"1000 merges over 50k words in $secs%.2f s")
    assert(secs < 60.0, f"incremental BPE took $secs%.1f s for 1000 merges — regression")
  }

  test("mergesTable round-trips the vocabulary artifact") {
    val t = Bpe.mergesTable(spark, golden)
    assert(t.columns.toSeq === Seq("rank", "left", "right"))
    val back = t.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(back === golden)
  }
}
