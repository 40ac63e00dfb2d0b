package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SentencesSpec extends SparkSpec {
  import spark.implicits._

  private def split(text: String): Seq[String] =
    Seq(text).toDF("t").select(TextFunctions.sentences(col("t")).as("s"))
      .collect()(0).getAs[scala.collection.Seq[String]]("s").toSeq

  test("basic segmentation on terminator runs") {
    assert(split("One sentence. Two! Three?? And a trailing remainder") ===
      Seq("One sentence.", "Two!", "Three??", "And a trailing remainder"))
  }

  test("closing quotes and brackets stay attached to their sentence") {
    assert(split("""He said "stop!" Then left.""") ===
      Seq("""He said "stop!"""", "Then left."))
    assert(split("Weird (but true!) right?") ===
      Seq("Weird (but true!)", "right?"))
  }

  test("whitespace-only and empty pieces drop; newlines trim") {
    assert(split("A.\n\nB.\n") === Seq("A.", "B."))
    assert(split("") === Seq.empty)
    assert(split("   \n\t ") === Seq.empty)
    assert(split("...") === Seq.empty) // terminators with no content
  }

  test("deterministic-tier limitation is what it says: abbreviations split") {
    // documented heuristic-tier behavior, pinned so it cannot drift silently
    assert(split("Dr. Smith arrived.") === Seq("Dr.", "Smith arrived."))
  }

  test("NULL text yields NULL array") {
    val r = Seq((1, null.asInstanceOf[String])).toDF("id", "t")
      .select(TextFunctions.sentences(col("t"))).collect()(0)
    assert(r.isNullAt(0))
  }

  // --- abbreviation-guard tier ------------------------------------------

  private def splitG(text: String, abbrevs: Seq[String] = TextFunctions.DefaultAbbreviations): Seq[String] =
    Seq(text).toDF("t")
      .select(TextFunctions.sentencesAbbrevGuard(col("t"), abbrevs).as("s"))
      .collect()(0).getAs[scala.collection.Seq[String]]("s").toSeq

  test("abbreviation guard: titles and latinisms no longer break sentences") {
    assert(splitG("Dr. Smith arrived.") === Seq("Dr. Smith arrived."))
    assert(splitG("See e.g. the appendix. Then stop.") ===
      Seq("See e.g. the appendix.", "Then stop."))
    assert(splitG("They met at 5 p.m. sharp! Done.") ===
      Seq("They met at 5 p.m. sharp!", "Done."))
    assert(splitG("The U.S. army won. Yes.") === Seq("The U.S. army won.", "Yes."))
    assert(splitG("Prof. Lee et al. wrote this. True.") ===
      Seq("Prof. Lee et al. wrote this.", "True."))
  }

  test("abbreviation guard: left boundary — a word merely ENDING in the list splits") {
    // "...ndr." is not "Dr." (letter before the match kills the boundary)
    assert(splitG("Saw Bandr. Smith left.") === Seq("Saw Bandr.", "Smith left."))
    // lowercase 'dr.' is not the case-sensitive entry 'Dr'
    assert(splitG("some dr. here. Next.") === Seq("some dr.", "here.", "Next."))
  }

  test("abbreviation guard limitation pinned: sentence-FINAL abbreviation does not break") {
    assert(splitG("He saw the Dr. Then left.") === Seq("He saw the Dr. Then left."))
  }

  test("abbreviation guard: non-listed periods still split; custom lists work") {
    assert(splitG("One sentence. Two! Three?") === Seq("One sentence.", "Two!", "Three?"))
    assert(splitG("Approx. five items. Done.", Seq("Approx")) ===
      Seq("Approx. five items.", "Done."))
    // without 'Approx' in the list it splits
    assert(splitG("Approx. five items. Done.", Seq("Dr")) ===
      Seq("Approx.", "five items.", "Done."))
  }

  test("abbreviation guard: NULL propagates; guard output never contains the sentinel") {
    val r = Seq((1, null.asInstanceOf[String])).toDF("id", "t")
      .select(TextFunctions.sentencesAbbrevGuard(col("t"))).collect()(0)
    assert(r.isNullAt(0))
    assert(splitG("Dr. A met Mrs. B. Then e.g. this.").forall(!_.contains("\uE000")))
  }
}
