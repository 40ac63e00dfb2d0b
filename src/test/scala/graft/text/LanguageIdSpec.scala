package graft.text

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Trained fastText-shape LID vs the marker-word heuristic, on a
  * planted multilingual fixture with known ground truth.
  */
class LanguageIdSpec extends SparkSpec {
  import spark.implicits._

  // per-language word pools: function words + content words, scripts
  // mixed Latin/Cyrillic/Greek/CJK/Devanagari; every doc samples from
  // ONE pool so ground truth is exact
  private val pools: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "wald", "und", "über", "schnell", "nicht", "zeitung",
      "straße", "ein", "können", "haus", "für", "wichtig", "zwischen"),
    "el" -> Seq("και", "το", "πόλη", "να", "θάλασσα", "της", "με", "γρήγορα",
      "που", "βιβλίο", "την", "από", "σημαντικό", "άνθρωπος"),
    "en" -> Seq("the", "forest", "and", "quickly", "newspaper", "not",
      "street", "a", "can", "house", "for", "important", "between", "people"),
    "es" -> Seq("el", "bosque", "y", "rápido", "periódico", "no", "calle",
      "una", "puede", "casa", "por", "importante", "entre", "gente"),
    "fr" -> Seq("le", "forêt", "et", "rapidement", "journal", "pas", "rue",
      "une", "peut", "maison", "pour", "important", "entre", "gens"),
    "hi" -> Seq("के", "जंगल", "और", "जल्दी", "अख़बार", "नहीं", "सड़क",
      "एक", "सकता", "घर", "लिए", "महत्वपूर्ण", "बीच", "लोग"),
    "ru" -> Seq("и", "лес", "быстро", "газета", "не", "улица", "один",
      "может", "дом", "для", "важно", "между", "люди", "город"),
    "zh" -> Seq("的", "森林", "和", "快速", "报纸", "不", "街道", "一个",
      "可以", "房子", "为了", "重要", "之间", "人们"))

  private def docText(id: Long): (String, String) = {
    val (lang, pool) = pools((id % pools.length).toInt)
    val words = (0 until 9).map(k => pool(((id / pools.length + k * 3 + k * k) % pool.length).toInt))
    (lang, words.mkString(" "))
  }

  private lazy val corpus = (0L until 400L).map { id =>
    val (lang, text) = docText(id)
    (id, lang, text)
  }.toDF("doc_id", "lang", "text")

  test("char LID n-grams: normalization and codepoint windows") {
    def grams(s: String, n: Int) = Seq(s).toDF("t")
      .select(LanguageId.charNgrams(col("t"), n).as("g"))
      .collect()(0).getSeq[String](0)
    assert(grams("AbC", 2) === Seq("ab", "bc"))
    // non-word runs collapse to ONE space, edges trimmed
    assert(grams("  a,,b  ", 3) === Seq("a b"))
    // codepoint windows across scripts (no UTF-16 splitting)
    assert(grams("汉字x", 2) === Seq("汉字", "字x"))
    // shorter than n -> empty
    assert(grams("ab", 3) === Seq.empty)
    // only non-word chars -> empty
    assert(grams("!!! ???", 1) === Seq.empty)
  }

  private lazy val train = corpus.where(col("doc_id") % 5 =!= 4)
  private lazy val heldOut = corpus.where(col("doc_id") % 5 === 4)
  private lazy val model = LanguageId.train(train, "text", "lang",
    n = 3, numFeatures = 1 << 16, maxIter = 60)

  test("trained LID beats the marker heuristic on held-out planted docs") {
    val scored = LanguageId.score(model, heldOut, "text")
    val n = heldOut.count()
    val accTrained = scored.where(col("lang_pred") === col("lang")).count().toDouble / n
    val accMarker = heldOut
      .withColumn("g", TextFunctions.langGuess(col("text"), unicode = true))
      .where(col("g") === col("lang")).count().toDouble / n
    assert(accTrained >= 0.95, s"trained accuracy $accTrained")
    assert(accTrained > accMarker + 0.2,
      s"trained $accTrained must clearly beat marker heuristic $accMarker")
  }

  test("bounded export scores the training set exactly like the full model") {
    // export wide enough to cover EVERY training gram: the bounded
    // margin then equals the LR margin on training docs, so argmax
    // predictions must agree exactly
    val bounded = LanguageId.exportBounded(model, train, "text", maxGrams = 100000)
    val full = LanguageId.score(model, train, "text")
      .select(col("doc_id"), col("lang_pred").as("full_pred"))
    val viaBounded = LanguageId.scoreBounded(train, "doc_id", "text", bounded, n = 3)
    val joined = full.join(viaBounded, "doc_id")
    assert(joined.where(col("full_pred") =!= col("lang_pred")).count() === 0)
  }

  test("bounded scoring predicts by intercept when no model gram matches") {
    val bounded = LanguageId.exportBounded(model, train, "text", maxGrams = 50)
    val res = LanguageId.scoreBounded(
      Seq((99L, "0 0 0 0")).toDF("doc_id", "text"), "doc_id", "text", bounded, n = 3)
      .collect()
    assert(res.length === 1) // one prediction row, margin = max intercept class
    val inter = bounded.where(col("gram") === "").collect()
      .map(r => (r.getString(1), r.getDouble(2)))
    val want = inter.sortBy { case (l, b) =>
      (-BigDecimal(b).setScale(6, BigDecimal.RoundingMode.HALF_UP), l)
    }.head._1
    assert(res(0).getString(1) === want)
  }

  test("bounded export carries intercepts and per-class rows for every gram") {
    val bounded = LanguageId.exportBounded(model, train, "text", maxGrams = 20)
    val nLang = pools.length
    assert(bounded.where(col("gram") === "").count() === nLang)
    val counts = bounded.where(col("gram") =!= "")
      .groupBy("gram").count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).toSeq === Seq(nLang.toLong))
  }
}
