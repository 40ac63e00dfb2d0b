package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The MEASURED recall ladder for the q41/q96 per-block cap (round-7
  * verdict task #5). The cap keeps the `blockCap` smallest ids per
  * block-gram, bounding a viral-boilerplate block at cap²/2 candidate
  * rows — the scale bound that fixed the sf100 41×/decade blowup. Its
  * recall trade is: a pair whose EVERY shared block-gram overflows the
  * cap is missed. This corpus makes that trade exactly measurable:
  *
  *  - every document ends with the same viral 8-word boilerplate run,
  *    so one block holds the whole corpus and the cap must bite;
  *  - 50 planted VIRAL-ONLY pairs (ids 2p, 2p+1 for p < 50): the docs
  *    share two 7-word runs (shared 5-grams, Jaccard ≈ 0.26) broken by
  *    doc-specific words so no private 8-run is shared — their ONLY
  *    shared 8-gram is the viral one, and pair p is found iff BOTH ids
  *    sit inside the cap, i.e. iff 2p+1 <= cap-1;
  *  - 25 planted PRIVATE-BLOCK pairs (ids 10000+): the docs share a
  *    12-word private run, so a 2-occupancy private block finds them
  *    at ANY cap;
  *  - 150 background docs (ids 100..249) with fully unique words.
  *
  * Expected recall on viral-only pairs is therefore deterministic:
  * floor(cap/2)/50 — the ladder 16 -> 8/50, 64 -> 32/50, 256 -> 50/50
  * asserted EXACTLY below, with private-block recall pinned at 100% at
  * every cap and zero false pairs. The measured table lives in
  * BENCHNOTES.md ("Block-cap recall ladder").
  */
class BlockCapRecallSpec extends SparkSpec {
  import spark.implicits._

  private val viral = (1 to 8).map(i => s"viral$i").mkString(" ")

  private def corpus() = {
    val viralOnly = (0 until 50).flatMap { p =>
      val run1 = (1 to 7).map(i => s"p${p}c$i").mkString(" ")
      val run2 = (8 to 14).map(i => s"p${p}c$i").mkString(" ")
      def doc(tag: String) =
        s"$run1 p$p${tag}x $run2 " +
          (1 to 5).map(i => s"p$p$tag$i").mkString(" ") + s" $viral"
      Seq((2L * p, doc("a")), (2L * p + 1, doc("b")))
    }
    val privateBlock = (0 until 25).flatMap { p =>
      val run = (1 to 12).map(i => s"q${p}r$i").mkString(" ")
      Seq(
        (10000L + 2 * p, s"$run ${(1 to 5).map(i => s"q${p}xa$i").mkString(" ")} $viral"),
        (10001L + 2 * p, s"$run ${(1 to 5).map(i => s"q${p}xb$i").mkString(" ")} $viral"))
    }
    val background = (100 until 250).map { i =>
      (i.toLong, (1 to 30).map(j => s"bg${i}w$j").mkString(" ") + " " + viral)
    }
    (viralOnly ++ privateBlock ++ background).toDF("doc_id", "text")
  }

  // threshold 0.15: planted viral-only pairs score ~0.263 and
  // private-block pairs ~0.4, while any cross pair shares only the 4
  // viral-internal 5-grams (<= 0.11)
  private def foundPairs(cap: Int): Set[(Long, Long)] =
    Dedup.jaccardPairs(corpus(), "doc_id", "text",
        n = 5, blockN = 8, blockCap = cap, minJaccard = 0.15)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("planted ladder: viral-only recall is exactly floor(cap/2)/50 at caps 16/64/256") {
    val viralPlanted = (0 until 50).map(p => (2L * p, 2L * p + 1)).toSet
    val privPlanted = (0 until 25).map(p => (10000L + 2 * p, 10001L + 2 * p)).toSet
    val results = Seq(16, 64, 256).map { cap =>
      val found = foundPairs(cap)
      val viralFound = found.intersect(viralPlanted).size
      val privFound = found.intersect(privPlanted).size
      // no pair outside the planted set may clear the threshold
      val falsePairs = found -- viralPlanted -- privPlanted
      assert(falsePairs.isEmpty, s"cap=$cap false pairs: ${falsePairs.take(5)}")
      // private-block pairs are immune to the cap — the trade only loses
      // pairs whose every shared gram is viral
      assert(privFound === 25, s"cap=$cap lost private-block pairs: $privFound/25")
      (cap, viralFound)
    }
    // the ladder, exactly: both ids inside the cap <=> 2p+1 <= cap-1
    assert(results === Seq((16, 8), (64, 32), (256, 50)),
      s"measured viral-only ladder diverged: $results")
    info(s"block-cap recall ladder (viral-only pairs, n=50): " +
      results.map { case (c, f) => s"cap=$c -> $f/50" }.mkString(", "))
  }

  test("the cap only loses pairs, never invents them") {
    assert(foundPairs(16).subsetOf(foundPairs(256)))
  }
}
