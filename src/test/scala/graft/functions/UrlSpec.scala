package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def parse(url: String): (String, String, Any, String, String, String) = {
    val r = Seq(url).toDF("u").select(Url.urlParts(col("u")).as("p"))
      .select("p.scheme", "p.host", "p.port", "p.path", "p.query", "p.domain")
      .collect()(0)
    def s(i: Int): String = if (r.isNullAt(i)) null else r.getString(i)
    (s(0), s(1), if (r.isNullAt(2)) null else r.getInt(2), s(3), s(4), s(5))
  }

  test("full URL decomposes; scheme and host fold to lowercase") {
    assert(parse("HTTPS://User:pw@Sub.Example.COM:8443/a/b?q=1&r=2#frag") ===
      (("https", "sub.example.com", 8443, "/a/b", "q=1&r=2", "example.com")))
  }

  test("minimal URL: no port, no query, empty path") {
    assert(parse("http://example.org") ===
      (("http", "example.org", null, "", null, "example.org")))
  }

  test("last-two-label domain heuristic (documented ccTLD limitation)") {
    assert(parse("https://news.bbc.co.uk/x")._6 === "co.uk")
    assert(parse("https://host7.example.com/x")._6 === "example.com")
    // single-label host has no two-label domain
    assert(parse("http://localhost:8080/")._6 === null)
  }

  test("IPv6 bracket hosts keep brackets; port splits on the outer colon") {
    assert(parse("http://[2001:db8::1]:8080/p") ===
      (("http", "[2001:db8::1]", 8080, "/p", null, null)))
  }

  test("non-URLs and relative references yield NULL scheme/host") {
    for (junk <- Seq("", "not a url", "/relative/path?x=1", "mailto:a@b.c", "12345")) {
      val (scheme, host, _, _, _, domain) = parse(junk)
      assert(scheme === null, junk)
      assert(host === null, junk)
      assert(domain === null, junk)
    }
  }

  test("query stops at the fragment; fragment never leaks into path") {
    val (_, _, _, path, query, _) = parse("https://h.example.com/p/q?a=b#notpath?notquery")
    assert(path === "/p/q")
    assert(query === "a=b")
  }

  test("a '?' inside the fragment is NOT a query; non-URLs have no query") {
    assert(parse("http://h.example.com/p#frag?x=1")._5 === null)
    assert(parse("what? no.")._5 === null) // gated on authority
  }

  private def etld1(url: String, suffixes: Seq[String] = PublicSuffix.Snapshot): String = {
    val r = Seq(url).toDF("u")
      .select(Url.registrableDomain(col("u"), suffixes).as("d")).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("eTLD+1: multi-label public suffixes key one more label than the heuristic") {
    assert(etld1("https://news.bbc.co.uk/x") === "bbc.co.uk")
    assert(etld1("https://Sub0.host3.example.CO.UK/p") === "example.co.uk")
    assert(etld1("https://a.b.company.com.au/") === "company.com.au")
    // generic TLD: same answer as the heuristic
    assert(etld1("https://sub.host7.example.com/x") === "example.com")
  }

  test("eTLD+1: 3-label private suffixes (s3.amazonaws.com) resolve at k=3") {
    assert(etld1("https://mybucket.s3.amazonaws.com/key") === "mybucket.s3.amazonaws.com")
    assert(etld1("https://x.mybucket.s3.amazonaws.com/key") === "mybucket.s3.amazonaws.com")
    // github.io: each user site is its own registrable domain
    assert(etld1("https://someuser.github.io/repo") === "someuser.github.io")
  }

  test("eTLD+1: host that IS a public suffix has no registrable domain") {
    assert(etld1("https://co.uk/") === null)
    assert(etld1("https://s3.amazonaws.com/") === null)
    // but amazonaws.com itself is registrable (only s3.* is listed)
    assert(etld1("https://amazonaws.com/") === "amazonaws.com")
  }

  test("eTLD+1: wildcard rules make every next label a public suffix") {
    // *.ck: any <x>.ck is a registry, so the registrable domain is one
    // label deeper than the last-two heuristic
    assert(etld1("https://www.example.ck/x") === "www.example.ck")
    assert(etld1("https://deep.www.example.ck/x") === "www.example.ck")
    // a host that IS a wildcard-matched suffix has no registrant
    assert(etld1("https://example.ck/") === null)
    assert(etld1("https://ck/") === null) // bare TLD: nothing to key
    // the other live wildcard sections resolve the same way
    assert(etld1("https://a.gov.np/") === "a.gov.np")
    assert(etld1("https://b.a.gov.mm/") === "a.gov.mm")
  }

  test("eTLD+1: exception rules prevail over their wildcard") {
    // !www.ck carves www.ck out of *.ck: the rule itself is registrable
    assert(etld1("https://www.ck/") === "www.ck")
    assert(etld1("https://anything.www.ck/") === "www.ck")
    assert(etld1("https://deep.anything.www.ck/") === "www.ck")
    // neighbouring labels still follow the wildcard
    assert(etld1("https://wwww.ck/") === null)
    assert(etld1("https://x.wwww.ck/") === "x.wwww.ck")
  }

  test("eTLD+1: malformed rule lists fail fast") {
    intercept[IllegalArgumentException] { etld1("https://a.b/", Seq("*.")) }
    intercept[IllegalArgumentException] { etld1("https://a.b/", Seq("!ck")) }
    intercept[IllegalArgumentException] { etld1("https://a.b/", Seq("a.*.b")) }
    intercept[IllegalArgumentException] { etld1("https://a.b/", Seq(".co.uk")) }
  }

  test("eTLD+1: unknown TLD falls back to the implicit * rule (last two labels)") {
    assert(etld1("https://a.b.example.zz/") === "example.zz")
    assert(etld1("http://localhost/") === null) // no dot, no domain
    assert(etld1("http://[2001:db8::1]/p") === null) // bracket host
    assert(etld1("not a url") === null)
  }

  private def canon(url: String): String = {
    val r = Seq(url).toDF("u")
      .select(Url.canonicalize(col("u")).as("c")).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("canonicalize: noise variants of one logical URL collapse to one key") {
    val expected = "https://host.example.com/p?a=1&b=2"
    assert(canon("HTTPS://Host.Example.COM:443/p?b=2&a=1#frag") === expected)
    assert(canon("https://host.example.com/p?a=1&utm_source=feed&b=2") === expected)
    assert(canon("https://bot:pw@host.example.com/p?fbclid=X&b=2&gclid=Y&a=1") === expected)
  }

  test("canonicalize: non-default ports survive; mismatched defaults survive") {
    assert(canon("http://h.example.com:8080/x") === "http://h.example.com:8080/x")
    // 443 is NOT http's default port
    assert(canon("http://h.example.com:443/x") === "http://h.example.com:443/x")
    assert(canon("http://h.example.com:80/x") === "http://h.example.com/x")
  }

  test("canonicalize: empty path becomes '/'; all-tracking query drops the '?'") {
    assert(canon("http://h.example.com") === "http://h.example.com/")
    assert(canon("http://h.example.com?utm_campaign=x&utm_medium=y") === "http://h.example.com/")
    assert(canon("not a url") === null)
  }

  test("canonicalize: uppercase and valueless tracking params strip too") {
    val expected = "https://host.example.com/p?a=1&b=2"
    // case-insensitive names (UTM_SOURCE=, FbClId)
    assert(canon("https://host.example.com/p?UTM_Source=Feed&a=1&b=2") === expected)
    assert(canon("https://host.example.com/p?a=1&FBCLID=X&b=2") === expected)
    // valueless bare param
    assert(canon("https://host.example.com/p?b=2&fbclid&a=1") === expected)
    // CONSECUTIVE tracking params (run-consuming pattern, not one-per-match)
    assert(canon("https://host.example.com/p?fbclid&gclid=Z&utm_medium=y&a=1&b=2") === expected)
    assert(canon("https://host.example.com/p?a=1&b=2&fbclid&gclid") === expected)
    // a tracking NAME as a prefix of a longer param survives
    assert(canon("https://host.example.com/p?fbclid_other=x") ===
      "https://host.example.com/p?fbclid_other=x")
  }

  test("registrableDomainOfHost lowercases caller suffixes (tier parity)") {
    // a mixed-case suffix entry must behave exactly like the DataFrame
    // tier, which lowercases its suffix column
    val r = Seq("news.bbc.co.uk").toDF("h")
      .select(Url.registrableDomainOfHost(col("h"), Seq("CO.UK")).as("d"))
      .collect()(0)
    assert(r.getString(0) === "bbc.co.uk")
  }

  test("eTLD+1 DataFrame tier (broadcast suffix join) agrees with the column tier") {
    val urls = Seq(
      "https://news.bbc.co.uk/x", "https://sub.host7.example.com/x",
      "https://mybucket.s3.amazonaws.com/key", "https://co.uk/",
      "https://a.b.example.zz/", "http://[2001:db8::1]/p", "junk",
      // wildcard + exception rules must agree across tiers too
      "https://www.example.ck/x", "https://example.ck/",
      "https://www.ck/", "https://deep.anything.www.ck/",
      "https://a.gov.np/")
    val df = urls.toDF("u")
    val joined = Url.withRegistrableDomain(
        df, "u", "etld1", PublicSuffix.Snapshot.toDF("suffix"))
      .select("u", "etld1").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    urls.foreach { u => assert(joined(u) === etld1(u), u) }
  }
}
