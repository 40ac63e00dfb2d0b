package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4 line-level cleaning (Raffel et al. 2020 §2.2): the line-retention
  * kernel and the page-level verdict struct.
  */
class C4FilterSpec extends SparkSpec {
  import spark.implicits._

  private def kept(page: String, minWords: Int = 5): String = {
    val r = Seq(page).toDF("t")
      .select(TextFunctions.c4KeepLines(col("t"), minWords).as("k")).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("keeps lines ending in each terminal mark with enough words") {
    val page = Seq(
      "A sentence that ends with a period.",
      "Does this question have enough words?",
      "This exclamation also has enough words!",
      "\"A quoted line with enough words inside.\"").mkString("\n")
    assert(kept(page) === page)
  }

  test("drops short lines, unterminated lines and javascript lines") {
    val page = Seq(
      "Too short.",                                    // < 5 words
      "No terminal punctuation on this line at all",   // no end mark
      "Please enable JAVASCRIPT to continue reading.", // case-insensitive
      "This perfectly fine line survives the filter.").mkString("\n")
    assert(kept(page) === "This perfectly fine line survives the filter.")
  }

  test("lines are stripped before evaluation and emitted stripped") {
    assert(kept("   Padded line has exactly seven words total.  \t ") ===
      "Padded line has exactly seven words total.")
    // trailing whitespace after the period must not defeat the end-mark rule
    assert(kept("Ends with a period then spaces here.   ") ===
      "Ends with a period then spaces here.")
  }

  test("a tracking word inside a longer word still drops (substring scan)") {
    // C4's rule is "any line with the word Javascript" — the public
    // implementation greps the lowercase substring, so so do we
    assert(kept("The javascripty framework made this page load.") === "")
  }

  test("empty input, whitespace-only lines, NULL") {
    assert(kept("") === "")
    assert(kept(" \t \n   ") === "")
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "t")
      .select(TextFunctions.c4KeepLines(col("t")).as("k")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("c4Flags: page rules fire independently of line retention") {
    val good = Seq(
      "First ordinary sentence with enough words here.",
      "Second ordinary sentence with enough words here.",
      "Third ordinary sentence with enough words here.").mkString("\n")
    def flags(page: String, blocklist: Seq[String] = Nil) = {
      val r = Seq(page).toDF("t")
        .select(TextFunctions.c4Flags(col("t"), blocklist = blocklist).as("f"))
        .select("f.n_lines", "f.n_kept", "f.has_lorem", "f.has_brace",
          "f.has_blocked", "f.pass").collect()(0)
      (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5))
    }
    assert(flags(good) === ((3L, 3L, false, false, false, true)))
    // lorem ipsum anywhere on the page fails it, case-insensitively
    assert(flags(good + "\nLOREM IPSUM dolor sit amet consectetur.") ===
      ((4L, 4L, true, false, false, false)))
    // a curly brace anywhere fails the page even on a dropped line
    assert(flags(good + "\nif (x) { return; }") ===
      ((4L, 3L, false, true, false, false)))
    // blocklist terms match through the ASCII fold
    assert(flags(good + "\nThis line mentions BadWord99 so it is flagged.",
      blocklist = Seq("badword99")) === ((4L, 4L, false, false, true, false)))
    // fewer than minKeptLines kept lines fails the page
    val twoLines = good.split("\n").take(2).mkString("\n")
    assert(flags(twoLines) === ((2L, 2L, false, false, false, false)))
  }

  test("c4Flags rejects non-lowercase blocklist terms") {
    intercept[IllegalArgumentException] {
      Seq("x").toDF("t")
        .select(TextFunctions.c4Flags(col("t"), blocklist = Seq("BadWord")))
    }
  }
}
