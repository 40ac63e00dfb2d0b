package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** r11: [[UrlAlgo]] compiled kernels must equal the regex tiers
  * value-for-value — the regex forms stay as the oracle-replayable
  * semantics ([[Url.urlHostRegex]] / [[Url.registrableDomainOfHostLadder]])
  * and the kernels are what the plans execute.
  */
class UrlKernelSpec extends SparkSpec {
  import spark.implicits._

  // every structural edge the two host parses could disagree on
  private val adversarial = Seq(
    null,
    "",
    "x",
    "http://example.com",
    "HTTPS://User:pw@Sub.Example.COM:8443/a/b?q=1&r=2#frag",
    "http://example.org",
    "ftp+x.y-z://host",               // full scheme alphabet
    "1http://host",                    // scheme must start with a letter
    "://host",                         // empty scheme
    "http:/host",                      // single slash
    "http//host",                      // no colon
    "http://",                         // empty authority
    "http://@",                        // empty user, empty host
    "http://user@",                    // userinfo only
    "http://a@b@c.example",            // multiple '@' (last wins)
    "http://user:pw@host:80",          // userinfo + port
    "http://host:",                    // trailing colon, empty port
    "http://:8080",                    // empty host with port
    "http://[::1]:443/p",              // bracket host + port
    "http://[::1]",                    // bracket host bare
    "http://[abc",                     // unclosed bracket -> no host
    "http://[]",                       // empty bracket pair
    "http://user@[::A]/x",             // bracket after userinfo, uppercase hex
    "http://host/path?q=1#f",
    "http://host?query-only",
    "http://host#frag-only",
    "http://host\r\n/evil",            // CR/LF terminate the authority
    "http://host\nx",
    "http://HOST.ExAmPlE.Com",         // case folding
    "http://xn--nxasmq6b.example",     // punycode-ish
    "http://\u00C5.example/\u00E9",    // non-ASCII host (Unicode lower)
    "http://K\u212A.example",          // Kelvin sign lowercases to 'k'
    "http://host..double.dots",
    "http://.leading.dot",
    "http://trailing.dot.",
    "http://single",
    "relative/path?x=1",
    "mailto:x@y.example",              // no "//" -> not an authority URL
    "a.b:c://host",                    // '.' in scheme run, ':' mid-string
    "http://host:notaport/x")

  private val suffixFixtures = Seq(
    null, "", "x", "com", "example.com", "a.example.com", "co.uk",
    "example.co.uk", "deep.example.co.uk", "ck", "example.ck",
    "t.example.ck", "www.ck", "x.www.ck", "a..b", "a.b.", ".a.b", "..",
    ".", "[::1]", "[", "single", "double.dots..x", "pvt.example",
    "a.pvt.example", "b.a.pvt.example", "kobe.jp", "x.kobe.jp",
    "y.x.kobe.jp", "city.kobe.jp", "z.city.kobe.jp", "K\u212A.co.uk")

  // a rule list exercising normals, wildcards and exceptions at mixed
  // depths (the PSL's own documented example set)
  private val rules = Seq("co.uk", "example.ck", "*.kobe.jp",
    "!city.kobe.jp", "*.ck", "!www.ck", "pvt.example", "a.pvt.example")

  test("UrlHostExpr equals the regex host parse on adversarial URLs") {
    val df = adversarial.toDF("u")
      .select(Url.urlHost(col("u")).as("k"), Url.urlHostRegex(col("u")).as("r"))
    df.collect().zip(adversarial).foreach { case (row, in) =>
      val k = if (row.isNullAt(0)) null else row.getString(0)
      val r = if (row.isNullAt(1)) null else row.getString(1)
      assert(k === r, s"host mismatch for input: $in")
    }
  }

  test("RegistrableDomainOfHostExpr equals the ladder on adversarial hosts") {
    val df = suffixFixtures.toDF("h")
      .select(Url.registrableDomainOfHost(col("h"), rules).as("k"),
        Url.registrableDomainOfHostLadder(col("h"), rules).as("r"))
    df.collect().zip(suffixFixtures).foreach { case (row, in) =>
      val k = if (row.isNullAt(0)) null else row.getString(0)
      val r = if (row.isNullAt(1)) null else row.getString(1)
      assert(k === r, s"domain mismatch for host: $in")
    }
  }

  test("kernels equal regex tiers on randomized URL-ish strings") {
    val urlChar = Gen.frequency(
      (8, Gen.alphaNumChar), (2, Gen.oneOf(':', '/', '@', '.', '[', ']',
        '?', '#', '&', '-', '+', '%', '\r', '\n')),
      (1, Gen.oneOf('\u00E9', '\u4E2D', '\u212A')))
    val urlGen = for {
      pre <- Gen.oneOf("", "http://", "HTTPS://", "x+y://", "9x://")
      body <- Gen.listOf(urlChar).map(_.mkString)
    } yield pre + body
    val samples = Gen.listOfN(400, urlGen).sample.getOrElse(Seq.empty)
    assert(samples.nonEmpty)
    val hostRows = samples.toDF("u")
      .select(Url.urlHost(col("u")).as("k"), Url.urlHostRegex(col("u")).as("r"))
      .collect()
    hostRows.zip(samples).foreach { case (row, in) =>
      val k = if (row.isNullAt(0)) null else row.getString(0)
      val r = if (row.isNullAt(1)) null else row.getString(1)
      assert(k === r, s"host mismatch for input: ${in.replace("\r", "\\r").replace("\n", "\\n")}")
    }
    // domain over the host output AND over the raw noise (hosts are
    // lowercased by contract, but the kernel must match the ladder on
    // arbitrary bytes too)
    val domRows = samples.toDF("h")
      .select(Url.registrableDomainOfHost(col("h"), rules).as("k"),
        Url.registrableDomainOfHostLadder(col("h"), rules).as("r"))
      .collect()
    domRows.zip(samples).foreach { case (row, in) =>
      val k = if (row.isNullAt(0)) null else row.getString(0)
      val r = if (row.isNullAt(1)) null else row.getString(1)
      assert(k === r, s"domain mismatch for host: ${in.replace("\r", "\\r").replace("\n", "\\n")}")
    }
  }

  test("kernel matches interpreted eval (nullSafeEval path)") {
    // force the interpreted path by eval'ing the expression directly
    import org.apache.spark.unsafe.types.UTF8String
    val rulesObj = new UrlAlgo.PslRules(rules)
    suffixFixtures.filter(_ != null).foreach { h =>
      val viaEval = UrlAlgo.registrableDomain(UTF8String.fromString(h), rulesObj)
      val viaDf = Seq(h).toDF("h")
        .select(Url.registrableDomainOfHost(col("h"), rules).as("k")).collect()(0)
      val dfVal = if (viaDf.isNullAt(0)) null else viaDf.getString(0)
      val evVal = if (viaEval == null) null else viaEval.toString
      assert(evVal === dfVal, s"eval/codegen divergence for host: $h")
    }
  }
}
