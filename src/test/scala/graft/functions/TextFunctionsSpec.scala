package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  private def one(colExpr: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("t").select(colExpr).collect()(0).get(0)
  }

  private def df(text: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(text).toDF("t")
  }

  test("tokenCount") {
    assert(one(TextFunctions.tokenCount(col("t")), "the quick  brown fox") === 4)
    assert(one(TextFunctions.tokenCount(col("t")), "") === 0)
    assert(one(TextFunctions.tokenCount(col("t")), "   ") === 0)
    assert(one(TextFunctions.tokenCount(col("t")), "one") === 1)
  }

  test("bpeishTokenCount splits words, numbers and punctuation") {
    // "it's 42!" -> it, ', s, 42, ! = 5
    assert(one(TextFunctions.bpeishTokenCount(col("t")), "it's 42!") === 5)
  }

  test("punctRatio") {
    assert(one(TextFunctions.punctRatio(col("t")), "abcd") === 0.0)
    assert(one(TextFunctions.punctRatio(col("t")), "a!b!") === 0.5)
    assert(one(TextFunctions.punctRatio(col("t")), "") === 0.0)
  }

  test("dupNgramFraction: repetition signal with exact n-gram accounting") {
    val c = TextFunctions.dupNgramFraction(col("t"), 3)
    // "a b c a b c a b c": 7 3-grams, 3 distinct -> 1 - 3/7
    assert(one(c, "a b c a b c a b c") === (1.0 - 3.0 / 7.0))
    // all-distinct text -> 0
    assert(one(c, "one two three four") === 0.0)
    // fewer than n tokens -> 0 (not NaN)
    assert(one(c, "one two") === 0.0)
    assert(one(c, "") === 0.0)
    // fully repeated single token, n=1: 5 tokens 1 distinct
    assert(one(TextFunctions.dupNgramFraction(col("t"), 1), "x x x x x") === 0.8)
    // case-sensitive: "A b" != "a b"
    assert(one(TextFunctions.dupNgramFraction(col("t"), 2), "A b a b") === 0.0)
  }

  test("wordNgrams: distinct space-joined n-grams, original case") {
    val got = one(TextFunctions.wordNgrams(col("t"), 2), "a b c a b")
      .asInstanceOf[collection.Seq[String]].toSet
    assert(got === Set("a b", "b c", "c a"))
    assert(one(TextFunctions.wordNgrams(col("t"), 3), "x y")
      .asInstanceOf[collection.Seq[String]].isEmpty)
    assert(one(TextFunctions.wordNgrams(col("t"), 1), "  padded   words  ")
      .asInstanceOf[collection.Seq[String]].toSet === Set("padded", "words"))
  }

  test("stopwordRatio") {
    assert(one(TextFunctions.stopwordRatio(col("t")), "the cat and the dog") === 0.6)
    assert(one(TextFunctions.stopwordRatio(col("t")), "") === 0.0)
  }

  test("langGuess picks marker-dominant language, und when none") {
    assert(one(TextFunctions.langGuess(col("t")), "the cat is on the mat and it purrs") === "en")
    assert(one(TextFunctions.langGuess(col("t")), "der hund und die katze ist nicht da") === "de")
    assert(one(TextFunctions.langGuess(col("t")), "le chat est sur la table et vous") === "fr")
    assert(one(TextFunctions.langGuess(col("t")), "los gatos y el perro es una familia") === "es")
    assert(one(TextFunctions.langGuess(col("t")), "zzz qqq xxx") === "und")
  }

  test("fingerprint is case/whitespace/punct-insensitive") {
    val a = one(TextFunctions.fingerprint(col("t")), "Hello, World!")
    val b = one(TextFunctions.fingerprint(col("t")), "  hello world  ")
    val c = one(TextFunctions.fingerprint(col("t")), "different")
    assert(a === b)
    assert(a !== c)
  }

  test("charShingles") {
    assert(one(TextFunctions.charShingles(col("t"), 3), "abcd") ===
      Seq("abc", "bcd"))
    assert(one(TextFunctions.charShingles(col("t"), 5), "ab") === Seq())
    // normalization: uppercase + punctuation folded before shingling
    assert(one(TextFunctions.charShingles(col("t"), 3), "A-B-C-D") ===
      Seq("abc", "bcd"))
  }

  test("wordShingles") {
    assert(one(TextFunctions.wordShingles(col("t"), 2), "a b c") ===
      Seq("a b", "b c"))
    assert(one(TextFunctions.wordShingles(col("t"), 4), "a b c") === Seq())
  }

  test("minhashSignature: deterministic, length numHashes, permutation-sensitive") {
    val sig = TextFunctions.minhashSignature(col("t"), 3, 16, seed = 42)
    val a = one(sig, "the quick brown fox jumps over the lazy dog")
    val b = one(sig, "the quick brown fox jumps over the lazy dog")
    val c = one(sig, "a completely different document about spark")
    assert(a === b)
    assert(a !== c)
    assert(a.asInstanceOf[scala.collection.Seq[_]].length === 16)
  }

  test("minhash similarity correlates with Jaccard: near-identical docs share most of the signature") {
    val sig = TextFunctions.minhashSignature(col("t"), 3, 64, seed = 42)
    val a = one(sig, "the quick brown fox jumps over the lazy dog again and again").asInstanceOf[scala.collection.Seq[Long]]
    val b = one(sig, "the quick brown fox jumps over the lazy dog again and again!").asInstanceOf[scala.collection.Seq[Long]]
    val agree = a.zip(b).count { case (x, y) => x == y }
    assert(agree >= 48, s"expected >=48/64 matching minhashes, got $agree")
  }

  test("simhash64: identical docs identical hash; near docs within small Hamming distance") {
    val sh = TextFunctions.simhash64(col("t"))
    val a = one(sh, "spark is a unified analytics engine for large scale data").asInstanceOf[Long]
    val b = one(sh, "spark is a unified analytics engine for large scale data").asInstanceOf[Long]
    val c = one(sh, "spark is a unified analytics engine for large scale data processing").asInstanceOf[Long]
    assert(a === b)
    assert(java.lang.Long.bitCount(a ^ c) <= 16)
  }

  test("shingleHashSet + jaccardSorted: exact Jaccard by merge-intersect") {
    import spark.implicits._
    val df = Seq(("abcd", "abcd"), ("abcd", "bcde"), ("abcd", "zzzz")).toDF("a", "b")
    val j = df.select(TextFunctions.jaccardSorted(
      TextFunctions.shingleHashSet(col("a"), 3),
      TextFunctions.shingleHashSet(col("b"), 3)).as("j"))
      .collect().map(_.getDouble(0))
    assert(j(0) === 1.0)            // {abc,bcd} vs {abc,bcd}
    assert(j(1) === 1.0 / 3.0)      // {abc,bcd} vs {bcd,cde}
    assert(j(2) === 0.0)
  }

  test("winnowing fingerprints: deterministic, shared substring guarantees overlap") {
    val fp = TextFunctions.winnowingFingerprints(col("t"), shingleSize = 5, window = 4)
    val a = one(fp, "the quick brown fox jumps over the lazy dog near the river")
      .asInstanceOf[scala.collection.Seq[Long]].toSet
    val b = one(fp, "INTRO text then the quick brown fox jumps over the lazy dog near the river AND MORE")
      .asInstanceOf[scala.collection.Seq[Long]].toSet
    val c = one(fp, "completely different content with no overlap whatsoever in any region")
      .asInstanceOf[scala.collection.Seq[Long]].toSet
    // winnowing guarantee: shared substring of length >= k+w-1 (8) shares
    // at least one fingerprint
    assert((a & b).nonEmpty)
    assert((a & b).size > (a & c).size)
    // deterministic
    val a2 = one(fp, "the quick brown fox jumps over the lazy dog near the river")
      .asInstanceOf[scala.collection.Seq[Long]].toSet
    assert(a === a2)
    // sorted distinct
    val arr = one(fp, "the quick brown fox jumps over the lazy dog near the river")
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(arr === arr.sorted && arr.distinct.length === arr.length)
  }

  test("portable winnowing: md5-hash golden + same guarantee as the fast kernel") {
    val fp = TextFunctions.winnowingFingerprintsPortable(col("t"), shingleSize = 5, window = 4)
    val a = one(fp, "the quick brown fox jumps over the lazy dog near the river")
      .asInstanceOf[scala.collection.Seq[Long]].toSet
    val b = one(fp, "INTRO text then the quick brown fox jumps over the lazy dog near the river AND MORE")
      .asInstanceOf[scala.collection.Seq[Long]].toSet
    val c = one(fp, "completely different content with no overlap whatsoever in any region")
      .asInstanceOf[scala.collection.Seq[Long]].toSet
    assert((a & b).nonEmpty) // shared substring >= k+w-1 shares a fingerprint
    assert((a & b).size > (a & c).size)
    // hash golden: every fingerprint must equal the top 60 bits of the md5
    // of SOME 5-char shingle of the normalized text (independent recompute)
    val text = "the quick brown fox jumps over the lazy dog near the river"
    val md = java.security.MessageDigest.getInstance("MD5")
    val allShingleHashes = text.sliding(5).map { sh =>
      val d = md.digest(sh.getBytes("UTF-8")); md.reset()
      var h = 0L; (0 until 8).foreach(i => h = (h << 8) | (d(i) & 0xFFL)); h >>> 4
    }.toSet
    assert(a.subsetOf(allShingleHashes))
  }

  test("portable minhash: signature agreement estimates Jaccard; empty below k") {
    val sig = TextFunctions.minhashPortableSignature(col("t"), shingleSize = 5, numHashes = 64)
    val sets = TextFunctions.shingleHashSetPortable(col("t"), shingleSize = 5)
    val base = "the quick brown fox jumps over the lazy dog and runs far away to the river bank"
    val near = base + " with one extra tail phrase appended here"
    val sa = one(sig, base).asInstanceOf[scala.collection.Seq[Long]]
    val sb = one(sig, near).asInstanceOf[scala.collection.Seq[Long]]
    val ha = one(sets, base).asInstanceOf[scala.collection.Seq[Long]].toSet
    val hb = one(sets, near).asInstanceOf[scala.collection.Seq[Long]].toSet
    val trueJ = (ha & hb).size.toDouble / (ha | hb).size
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
    assert(math.abs(est - trueJ) < 0.25, s"minhash estimate $est vs true $trueJ")
    assert(trueJ > 0.5, "fixture texts should be genuinely similar")
    // below shingle size -> empty signature
    assert(one(sig, "ab").asInstanceOf[scala.collection.Seq[Long]].isEmpty)
    // constants are seed-deterministic (the oracle embeds them as literals)
    val (a1, b1) = graft.functions.TextAlgo.minhashPortableConsts(32, 42L)
    val (a2, b2) = graft.functions.TextAlgo.minhashPortableConsts(32, 42L)
    assert(a1.toSeq === a2.toSeq && b1.toSeq === b2.toSeq)
    val p = 2147483647L
    assert(a1.forall(a => a >= 1 && a < p) && b1.forall(b => b >= 0 && b < p))
  }

  test("portable simhash: near texts land close in hamming, far texts do not") {
    val sh = TextFunctions.simhash60Portable(col("t"))
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val far = "completely unrelated legal boilerplate concerning maritime insurance claims"
    val hb = one(sh, base).asInstanceOf[Long]
    val hn = one(sh, near).asInstanceOf[Long]
    val hf = one(sh, far).asInstanceOf[Long]
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hb, hn) < ham(hb, hf), s"near=${ham(hb, hn)} far=${ham(hb, hf)}")
    assert(ham(hb, hn) <= 12)
    // 60-bit: top 4 bits always clear; tokenless text -> 0
    assert((hb >>> 60) === 0L && (hf >>> 60) === 0L)
    assert(one(sh, "   ").asInstanceOf[Long] === 0L)
  }

  test("redactPii: typed placeholders, replacement-order safe") {
    val text = "mail bob.smith+x@corp.example.org from 192.168.1.77 or call 555-123-4567 x55"
    assert(one(TextFunctions.redactPii(col("t")), text) ===
      "mail <EMAIL> from <IP> or call <PHONE> x55")
    // counts on the original text, independent per pattern
    val (ne, ni, np) = TextFunctions.piiCounts(col("t"))
    assert(one(ne, text) === 1 && one(ni, text) === 1 && one(np, text) === 1)
    // an email's digit runs must not be double-claimed by phone/ip patterns
    assert(one(ni, "reach 10.0.0.1 and u123@h456.example.com") === 1)
    assert(one(TextFunctions.redactPii(col("t")), "no pii here at all") ===
      "no pii here at all")
  }

  test("qualityScore components") {
    // long-enough, low punct, has stopwords -> 1.0
    val good = "the quick brown fox jumps over the lazy dog and runs far away home"
    assert(one(TextFunctions.qualityScore(col("t")), good) === 1.0)
    // too short -> loses 0.4 length component
    assert(one(TextFunctions.qualityScore(col("t")), "the end") === 0.6)
  }

  test("gopherCounters: golden slot-by-slot accounting") {
    val text = "the cat and # dog...\n- bullet one\n- bullet two…\n   \nWith be to of"
    val g = one(TextFunctions.gopherCounters(col("t")), text).asInstanceOf[scala.collection.Seq[Long]]
    // tokens: the cat and # dog... | - bullet one | - bullet two… | With be to of  = 15
    assert(g(0) === 15, "word count")
    // lengths (code points): 3+3+3+1+6 + 1+6+3 + 1+6+4 + 4+2+2+2 = 47
    assert(g(1) === 47, "sum word length")
    assert(g(2) === 12, "alpha words: 15 minus '#' and the two bare '-' bullets")
    assert(g(3) === 1, "'#' chars")
    assert(g(4) === 1, "'...' runs")
    assert(g(5) === 1, "U+2026 chars")
    assert(g(6) === 4, "nonempty lines (the space-only line drops)")
    assert(g(7) === 2, "bullet lines")
    assert(g(8) === 2, "ellipsis-ending lines ('dog...' line and 'two…' line)")
    // distinct stopwords present: the, and, with(case-folds), be, to, of = 6
    assert(g(9) === 6, "distinct Gopher stopwords")
  }

  test("gopherCounters: '...' runs are non-overlapping and line trims are space-only") {
    val g = one(TextFunctions.gopherCounters(col("t")), ".......").asInstanceOf[scala.collection.Seq[Long]]
    assert(g(4) === 2, "7 dots = 2 non-overlapping '...' runs")
    // a tab-only line is NOT trimmed away (space-only trim contract)
    val g2 = one(TextFunctions.gopherCounters(col("t")), "a\n\t\n  \nb").asInstanceOf[scala.collection.Seq[Long]]
    assert(g2(6) === 3, "tab line counts nonempty; space-only line does not")
  }

  test("gopherFlags: paper thresholds verdict on crafted documents") {
    val passDoc = (1 to 60).map(i => s"word$i").mkString(" ") +
      " the cat sat with a dog and it was to be of note"
    val row = df(passDoc).select(TextFunctions.gopherFlags(col("t")).as("f"))
      .select("f.*").collect()(0)
    val names = Seq("fail_words", "fail_word_len", "fail_symbol", "fail_bullet",
      "fail_ellipsis", "fail_alpha", "fail_stopword", "pass")
    val vals = names.zipWithIndex.map { case (n, i) => n -> row.getBoolean(i) }.toMap
    assert(vals("pass"), s"crafted doc should pass all rules: $vals")
    // short doc trips the word-count rule only at the words slot
    val shortRow = df("the cat with of").select(TextFunctions.gopherFlags(col("t")).as("f"))
      .select("f.*").collect()(0)
    assert(shortRow.getBoolean(0), "fail_words for a 4-word doc")
    assert(!shortRow.getBoolean(7), "no pass")
    // zero-word documents must produce verdicts, not an ANSI
    // DIVIDE_BY_ZERO (the FuzzDiff-caught edge: ratios are branch-guarded)
    Seq("", "   ", "\n\n", "\t").foreach { t =>
      val r = df(t).select(TextFunctions.gopherFlags(col("t")).as("f"))
        .select("f.*").collect()(0)
      assert(r.getBoolean(0) && !r.getBoolean(7), s"empty-ish doc '$t' should fail_words, not pass")
    }
  }

  test("dedupLines: first occurrence wins, order and empties preserved") {
    assert(one(TextFunctions.dedupLines(col("t")), "a\nb\na\n\nb\nc") === "a\nb\n\nc")
    // no newline -> identity (fast path)
    assert(one(TextFunctions.dedupLines(col("t")), "plain text") === "plain text")
    // exact equality: differing leading whitespace is a different line
    assert(one(TextFunctions.dedupLines(col("t")), "x\n x\nx") === "x\n x")
    // empty string stays empty
    assert(one(TextFunctions.dedupLines(col("t")), "") === "")
  }

  test("htmlToText: tags, blocks, comments, entities, collapse") {
    def h(s: String): Any = one(TextFunctions.htmlToText(col("t")), s)
    assert(h("<p>Hello <b>world</b></p>") === "Hello world")
    // script/style blocks go whole, any case, with attributes
    assert(h("a<SCRIPT type='x'>var q=1;</SCRIPT>b<style>p{c:red}</style>c") === "a b c")
    // tag-name matching is ASCII-case only: U+017F 'long s' is NOT an
    // 's' (RE2's (?i) would Unicode-fold it, Java's would not — the
    // explicit [sS] classes pin BOTH engines to the ASCII behavior),
    // so <ſcript> is just an unknown tag: stripped, its body kept
    assert(h("<ſcript>x</ſcript>y") === "x y")
    assert(h("a<!-- hidden\nmultiline -->b") === "a b")
    // entity decode AFTER tag strip; &amp; last -> no double decode
    assert(h("x &lt;tag&gt; &quot;q&quot; &#39;a&#39; &nbsp; &amp;amp; y")
      === "x <tag> \"q\" 'a' &amp; y")
    // unterminated < stays literal; a < b > c loses the "< b >" span
    assert(h("a <tag") === "a <tag")
    assert(h("a < b > c") === "a c")
    // adjacent text runs never fuse across a tag
    assert(h("one<br>two") === "one two")
    // whitespace collapse is the explicit shared class (no \x0B)
    assert(h("  a \t\n b  ") === "a b")
    assert(h("a\u000Bb") === "a\u000Bb")
    // NBSP (U+00A0) is NOT whitespace to either engine: kept, even at
    // the string edges (DuckDB's one-arg trim strips it -- the oracle
    // pins trim(x, ' ') for exactly this reason; fz_html_text found it)
    assert(h("\u00a0the start") === "\u00a0the start")
    assert(one(TextFunctions.htmlToText(col("t")), null) === null)
  }
}
