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
}
