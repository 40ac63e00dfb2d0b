package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL decomposition for web-corpus curation — the keying primitives
  * behind per-domain caps (L36), domain mixing weights and crawl
  * frontier dedup. Production pipelines key on the HOST (or a domain
  * derived from it), not on a pre-supplied source label; these helpers
  * turn a raw `target_uri` column into those keys.
  *
  * Spark-first shape: every part is a composition of codegen'd
  * `regexp_extract`/`lower`/`nullif` BUILTINS — no UDF, no custom
  * kernel — and every regex keeps to the Java/RE2-shared syntax
  * discipline (explicit classes, `(?:...)`, no `\s`, no `(?i)`), so an
  * engine-independent oracle replays the parse byte-for-byte (q94).
  *
  * Scope (RFC 3986-lite, the curation subset): absolute URLs with an
  * explicit `scheme://`. Relative references parse to NULL scheme/host
  * (they have no domain to key on). IPv6 bracket hosts are passed
  * through verbatim (brackets included) — they contain `:` inside
  * brackets, so the port split keys on the LAST colon after `]`.
  */
object Url {

  // Shared-syntax discipline note on '$': Java's '$' also matches before
  // a FINAL newline, RE2's only at text end — a real divergence on
  // garbage input. The authority class therefore excludes line breaks
  // (an authority cannot contain them anyway), so every later
  // '$'-anchored sub-parse (port, domain) runs on break-free input
  // where the two semantics coincide.
  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val AuthorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#\\r\\n]*)"

  /** Lowercased scheme; NULL when the value is not an absolute URL. */
  def urlScheme(c: Column): Column =
    lower(nullif(regexp_extract(c, SchemeRe, 1), lit("")))

  /** The authority (userinfo@host:port) as written; NULL if absent. */
  def urlAuthority(c: Column): Column =
    nullif(regexp_extract(c, AuthorityRe, 1), lit(""))

  /** Lowercased host: authority minus userinfo and port. IPv6 bracket
    * hosts keep their brackets; the port colon is only split OUTSIDE
    * a closing bracket.
    */
  def urlHost(c: Column): Column = {
    val auth = regexp_extract(c, AuthorityRe, 1)
    val noUser = regexp_extract(auth, "(?:[^@]*@)?([^@]*)$", 1)
    // bracket form: take [..] verbatim; else strip a trailing :port
    val host = when(noUser.startsWith("["),
        regexp_extract(noUser, "^(\\[[^\\]]*\\])", 1))
      .otherwise(regexp_extract(noUser, "^([^:]*)", 1))
    lower(nullif(host, lit("")))
  }

  /** Port as an int; NULL when not written explicitly. */
  def urlPort(c: Column): Column =
    nullif(regexp_extract(urlAuthority(c), ":([0-9]+)$", 1), lit(""))
      .cast("int")

  /** Path as written ('' when absent — distinguishable from NULL = not
    * a URL at all).
    */
  def urlPath(c: Column): Column =
    when(urlAuthority(c).isNotNull,
      regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#\\r\\n]*([^?#]*)", 1))

  /** Query string (without '?'); NULL when absent. */
  def urlQuery(c: Column): Column =
    nullif(regexp_extract(c, "\\?([^#]*)", 1), lit(""))

  /** Keying domain: the last two labels of the host (`news.bbc.co.uk`
    * -> `co.uk`... no: -> `bbc.co.uk` requires the public-suffix list,
    * which is EXTERNAL DATA this engine does not embed). This is the
    * deterministic fallback: last-two-labels (`sub.host7.example.com`
    * -> `example.com`), correct for generic TLDs, one label short for
    * ccTLD suffixes like `co.uk` — callers needing eTLD+1 precision
    * join a broadcast suffix table on the host's label suffixes
    * instead. NULL for bracket/IP-ish hosts without two dot labels.
    */
  def urlDomain(c: Column): Column = {
    val h = urlHost(c)
    when(!h.startsWith("["), nullif(regexp_extract(h, "([^.]+[.][^.]+)$", 1), lit("")))
  }

  /** All parts as one struct column (one pass over the plan, shared
    * subexpressions collapse under codegen).
    */
  def urlParts(c: Column): Column = struct(
    urlScheme(c).as("scheme"), urlHost(c).as("host"), urlPort(c).as("port"),
    urlPath(c).as("path"), urlQuery(c).as("query"), urlDomain(c).as("domain"))
}
