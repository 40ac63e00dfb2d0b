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
}
