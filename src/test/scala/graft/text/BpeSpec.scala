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

  test("mergesTable round-trips the vocabulary artifact") {
    val t = Bpe.mergesTable(spark, golden)
    assert(t.columns.toSeq === Seq("rank", "left", "right"))
    val back = t.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(back === golden)
  }
}
