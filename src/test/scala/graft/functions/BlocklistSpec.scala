package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def hits(text: String, pats: Seq[String], bounded: Boolean): Int =
    Seq(Tuple1(text)).toDF("t")
      .select(TextFunctions.blocklistHits(col("t"), pats, bounded).as("h"))
      .collect()(0).getInt(0)

  test("hand-computed counts: overlap, self-overlap, case fold, boundaries") {
    // overlapping DIFFERENT patterns both count
    assert(hits("xaby", Seq("ab", "b"), bounded = false) === 2)
    // self-overlapping pattern counts every start position
    assert(hits("aaaa", Seq("aa"), bounded = false) === 3)
    // ASCII case fold on both sides
    assert(hits("Data DATA data", Seq("DaTa"), bounded = false) === 3)
    // word bounding: substring inside a word does not count
    assert(hits("database data data-base", Seq("data"), bounded = true) === 2)
    assert(hits("database data data-base", Seq("data"), bounded = false) === 3)
    // adjacent occurrences both count under bounding (no regex-style
    // boundary consumption)
    assert(hits("data data", Seq("data"), bounded = true) === 2)
    // edges of the string are boundaries
    assert(hits("data", Seq("data"), bounded = true) === 1)
    // digits block a word boundary; punctuation does not
    assert(hits("data1 data. d4ta", Seq("data"), bounded = true) === 1)
    // non-ASCII neighbor does not block (ASCII-word convention)
    assert(hits("cafédata dataé", Seq("data"), bounded = true) === 2)
    // multibyte pattern matches exactly, case untouched beyond ASCII
    assert(hits("a café b CAFÉ", Seq("café"), bounded = true) === 1)
    // phrase patterns (spaces inside) work
    assert(hits("a bad word here; bad word!", Seq("bad word"), bounded = true) === 2)
    // no hits
    assert(hits("clean text", Seq("data", "spark"), bounded = true) === 0)
  }

  test("matches a naive per-pattern indexOf reference on a randomized corpus") {
    val rng = new scala.util.Random(4242)
    val vocab = Seq("data", "base", "databased", "aa", "a", "spark", "SPARK",
      "café", "x1", "bad word")
    def naive(text: String, pats: Seq[String], bounded: Boolean): Int = {
      val t = text.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      def isW(c: Char) = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      pats.map { p0 =>
        val p = p0.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        var i = t.indexOf(p); var n = 0
        while (i >= 0) {
          val ok = !bounded ||
            ((i == 0 || !isW(t(i - 1))) && (i + p.length == t.length || !isW(t(i + p.length))))
          if (ok) n += 1
          i = t.indexOf(p, i + 1)
        }
        n
      }.sum
    }
    val texts = (0 until 120).map { _ =>
      (0 until rng.nextInt(25)).map { _ =>
        val w = vocab(rng.nextInt(vocab.length))
        if (rng.nextBoolean()) w else w + vocab(rng.nextInt(vocab.length))
      }.mkString(Seq(" ", "", ".", "-")(rng.nextInt(4)))
    }
    for (bounded <- Seq(true, false)) {
      val pats = Seq("data", "aa", "spark", "café", "bad word")
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val got = df.select(col("id"),
          TextFunctions.blocklistHits(col("t"), pats, bounded).as("h"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) === naive(t, pats, bounded), s"bounded=$bounded text=$t")
      }
    }
  }

  test("duplicate list entries are collapsed: hits count DISTINCT patterns") {
    // the same pattern listed twice (or in different case, which folds
    // to the same byte sequence) must not double-count occurrences
    assert(hits("data data", Seq("data", "data"), bounded = false) === 2)
    assert(hits("data data", Seq("data", "DATA", "Data"), bounded = true) === 2)
    assert(hits("aaaa", Seq("aa", "aa", "aa"), bounded = false) === 3)
  }

  test("pattern-byte cap fails fast; a large distinct list still builds") {
    val big = (0 until 3000).map(i => s"pattern$i") // ~30 KB: fine
    assert(hits("pattern42 and pattern2999", big, bounded = true) === 2)
    val over = (0 until 30000).map(i => s"p${i}_padding_padding_padding")
    val e = intercept[IllegalArgumentException] {
      AcAutomaton.build(over)
    }
    assert(e.getMessage.contains("blocklist too large"))
  }

  test("null text yields null; invalid pattern lists fail fast") {
    val r = Seq[(java.lang.Long, String)]((1L, null), (2L, "data")).toDF("id", "t")
      .select(col("id"), TextFunctions.blocklistHits(col("t"), Seq("data")).as("h"))
      .orderBy("id").collect()
    assert(r(0).isNullAt(1))
    assert(r(1).getInt(1) === 1)
    intercept[IllegalArgumentException] { AcAutomaton.build(Seq.empty) }
    intercept[IllegalArgumentException] { AcAutomaton.build(Seq("a", "")) }
  }

  test("SQL surface: graft_blocklist_hits matches the Column API") {
    import org.apache.spark.sql.SparkSession
    val s = spark.newSession()
    graft.sql.GraftFunctions.register(s)
    import s.implicits._
    Seq((1L, "Data base data"), (2L, "nothing here"))
      .toDF("id", "t").createOrReplaceTempView("bl_in")
    val rows = s.sql(
      "SELECT id, graft_blocklist_hits(t, array('data', 'base'), true) AS h " +
        "FROM bl_in ORDER BY id").collect()
    assert(rows(0).getInt(1) === 3)
    assert(rows(1).getInt(1) === 0)
  }
}
