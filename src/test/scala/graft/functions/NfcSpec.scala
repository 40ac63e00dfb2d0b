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

  test("caseFoldSimple: cross-script folding, sigma unification, sharp-s stability") {
    def fold(t: String): String = Seq(Tuple1(t)).toDF("t")
      .select(TextFunctions.caseFoldSimple(col("t"))).collect()(0).getString(0)
    // non-ASCII case variants fold together (L61's ASCII fold cannot)
    assert(fold("CAF\u00C9 NA\u00CFVE") === fold("caf\u00E9 na\u00EFve"))
    // final and medial sigma unify (fold, not lowercase: both -> sigma)
    assert(fold("\u03BF\u03C2") === fold("\u039F\u03A3"))
    assert(fold("\u03C2") === "\u03C3")
    // sharp-s is 1:1 stable under SIMPLE folding (no SS expansion)
    assert(fold("stra\u00DFe") === "stra\u00DFe")
    // Cyrillic
    assert(fold("\u0414\u0410\u041D\u041D\u042B\u0415") === "\u0434\u0430\u043d\u043d\u044b\u0435")
  }

  test("Dedup.exact(caseFold = true) collapses cross-script case variants") {
    val docs = Seq(
      (1L, "CAF\u00C9 R\u00C9SUM\u00C9 \u0394\u0395\u039B\u03A4\u0391"),
      (2L, "caf\u00E9 r\u00E9sum\u00E9 \u03B4\u03B5\u03BB\u03C4\u03B1"),
      (3L, "a different document")).toDF("doc_id", "text")
    val kept = graft.dedup.Dedup.exact(docs, "text", "doc_id",
        unicode = true, nfc = true, caseFold = true)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L))
    // without the fold tier the case variants stay distinct
    val keptRaw = graft.dedup.Dedup.exact(docs, "text", "doc_id",
        unicode = true, nfc = true)
      .select("doc_id").as[Long].collect().sorted
    assert(keptRaw.toSeq === Seq(1L, 2L, 3L))
  }
}
