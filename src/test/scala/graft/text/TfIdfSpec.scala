package graft.text

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {

  test("topTerms: hand-checked tf/df/idf on a 3-doc corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "cherry date date date")
    ).toDF("id", "body")
    val out = TfIdf.topTerms(docs, "id", "body", k = 2, maxDfFraction = 1.0)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    val n = 3.0
    def idf(df: Int) = math.log((n + 1) / (df + 1)) + 1
    // doc 0: apple tf=2 df=1 beats banana tf=1 df=2
    assert(out((0L, 1))._1 === "apple")
    assert(out((0L, 1))._2 === 2L && out((0L, 1))._3 === 1L)
    assert(math.abs(out((0L, 1))._4 - 2 * idf(1)) < 1e-12)
    assert(out((0L, 2))._1 === "banana")
    // doc 2: date tf=3 df=1 beats cherry tf=1 df=2
    assert(out((2L, 1))._1 === "date")
    assert(math.abs(out((2L, 1))._4 - 3 * idf(1)) < 1e-12)
    // doc 1: equal tfidf would tie-break alphabetically; here banana=cherry
    // on tf=1, df=2 -> tie broken by term asc
    assert(out((1L, 1))._1 === "banana" && out((1L, 2))._1 === "cherry")
  }

  test("max_df cutoff drops corpus-wide boilerplate terms before the join") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the apple"), (1L, "the banana"), (2L, "the cherry")
    ).toDF("id", "body")
    val terms = TfIdf.topTerms(docs, "id", "body", k = 5, maxDfFraction = 0.5)
      .select("term").collect().map(_.getString(0)).toSet
    assert(!terms.contains("the"), "a term in every doc must be cut at max_df=0.5")
    assert(terms === Set("apple", "banana", "cherry"))
  }

  test("tokenization: case-folded, punctuation-split, empties dropped") {
    import spark.implicits._
    val docs = Seq((0L, "Apple, APPLE!! ...banana")).toDF("id", "body")
    val out = TfIdf.topTerms(docs, "id", "body", k = 5, maxDfFraction = 1.0)
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(out === Map("apple" -> 2L, "banana" -> 1L))
  }
}
