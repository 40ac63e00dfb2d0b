package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NFC canonical composition and the nfc-keyed dedup fingerprint. */
class NfcSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "Caf\u00E9 d\u00E9j\u00E0 vu"
  private val decomposed = "Cafe\u0301 de\u0301ja\u0300 vu"

  private def norm(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.nfcNormalize(col("t"))).collect()(0).getString(0)

  test("nfcNormalize composes combining sequences; NFC input is identity") {
    assert(composed !== decomposed) // byte-distinct inputs...
    assert(norm(decomposed) === composed) // ...compose to the same NFC bytes
    assert(norm(composed) === composed)
    // Hangul jamo compose to the syllable
    assert(norm("\u1100\u1161") === "\uAC00")
    assert(norm("") === "")
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "t")
      .select(TextFunctions.nfcNormalize(col("t"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("fingerprint: nfc=true unifies encodings; nfc=false splits them") {
    def fp(s: String, unicode: Boolean, nfc: Boolean): String =
      Seq(s).toDF("t")
        .select(TextFunctions.fingerprint(col("t"), unicode, nfc)).collect()(0).getString(0)
    for (unicode <- Seq(false, true)) {
      assert(fp(composed, unicode, nfc = true) === fp(decomposed, unicode, nfc = true),
        s"unicode=$unicode")
      assert(fp(composed, unicode, nfc = false) !== fp(decomposed, unicode, nfc = false),
        s"unicode=$unicode")
    }
  }

  test("Dedup.exact(nfc = true) collapses encoding twins to the smallest id") {
    val docs = Seq(
      (1L, composed), (2L, decomposed),
      (3L, "unrelated third document")).toDF("doc_id", "text")
    val kept = graft.dedup.Dedup.exact(docs, "text", "doc_id", unicode = true, nfc = true)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L))
    val keptRaw = graft.dedup.Dedup.exact(docs, "text", "doc_id", unicode = true)
      .select("doc_id").as[Long].collect().sorted
    assert(keptRaw.toSeq === Seq(1L, 2L, 3L))
  }
}
