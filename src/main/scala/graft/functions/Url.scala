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

  /** Query string (without '?'); NULL when absent. Gated on a non-null
    * authority (like [[urlPath]] — non-URL cells yield NULL, not a
    * substring after a stray '?') and anchored AFTER the
    * scheme/authority/path prefix, so a '?' inside a fragment
    * (`http://h/p#frag?x`) is not misread as a query.
    */
  def urlQuery(c: Column): Column =
    when(urlAuthority(c).isNotNull,
      nullif(regexp_extract(c,
        "^[A-Za-z][A-Za-z0-9+.-]*://[^?#]*\\?([^#]*)", 1), lit("")))

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

  /** The last `k` dot-labels of a (break-free, lowercased) host column;
    * '' when the host has fewer than `k` labels. Shared Java/RE2 regex.
    */
  private def lastLabels(h: Column, k: Int): Column =
    regexp_extract(h, "([^.]+(?:[.][^.]+){" + (k - 1) + "})$", 1)

  /** eTLD+1 (registrable domain) against a caller-supplied public-suffix
    * list — the precision tier above [[urlDomain]]'s last-two-label
    * heuristic, which mis-keys every `*.co.uk`-style host to the suffix
    * itself and lumps all UK sites into one per-domain-cap bucket.
    *
    * Resolution (longest-match ladder, full PSL rule semantics):
    *  - a k-label suffix match keys the domain as the host's last k+1
    *    labels; NULL when the host IS the suffix (no registrant);
    *  - a WILDCARD rule `*.ck` (k labels counting `*`) matches any host
    *    whose last k-1 labels equal the tail and that has at least k
    *    labels — the wildcarded label is part of the public suffix, so
    *    the domain is the last k+1 labels (under `*.ck`, host
    *    `t.example.ck` has public suffix `example.ck` and registrable
    *    domain `t.example.ck`; host `example.ck` IS a suffix -> NULL);
    *  - an EXCEPTION rule `!www.ck` prevails over every other match
    *    (PSL algorithm): the public suffix is the rule minus its
    *    leftmost label, so the registrable domain is the rule itself
    *    for any host ending in it;
    *  - no listed suffix matching = the PSL's implicit `*` rule: the
    *    TLD alone is the public suffix, domain = last two labels —
    *    which is why `suffixes` only needs MULTI-label rules
    *    ([[PublicSuffix]] scaladoc); single-label entries are ignored.
    *  - bracket (IPv6) hosts and hosts without a dot yield NULL.
    *
    * All codegen'd builtins: the per-k candidate is one anchored
    * regexp_extract and the membership test an `isin` literal set
    * (Catalyst compiles large ones to InSet hash lookups) — replayable
    * in any engine as a CASE/IN ladder (q94/q97). For suffix tables too
    * big to inline in a plan, use [[withRegistrableDomain]].
    */
  def registrableDomain(c: Column, suffixes: Seq[String] = PublicSuffix.Snapshot): Column =
    registrableDomainOfHost(urlHost(c), suffixes)

  /** [[registrableDomain]] over an ALREADY-EXTRACTED host column. Prefer
    * this two-step form (materialize the host in its own projection,
    * then ladder over the column) when the URL itself is an expensive
    * expression: the ladder references the host ~2·maxK times, and
    * inlining a large URL derivation at every reference blows the
    * generated method past the JVM's 64 KB codegen limit (whole-stage
    * codegen then bails for the stage). A host ATTRIBUTE reference is
    * free; Catalyst's CollapseProject keeps the split because the
    * multiply-referenced extraction is non-cheap.
    */
  def registrableDomainOfHost(h: Column, suffixes: Seq[String] = PublicSuffix.Snapshot): Column = {
    require(suffixes.nonEmpty, "suffix list must be non-empty")
    // the host side is always lowercased (urlHost lowers; the scaladoc
    // contract for raw host columns requires it) — lower the suffix side
    // too, so a mixed-case entry like "CO.UK" matches exactly like the
    // DataFrame tier (withRegistrableDomain), which lowers its suffix column
    val (excRules, wildTails, normals) = splitRules(suffixes)
    val byLen = normals.groupBy(_.count(_ == '.') + 1)
    // wildcard rule length counts the `*` label
    val wildByLen = wildTails.groupBy(_.count(_ == '.') + 2)
    val maxK = (byLen.keys ++ wildByLen.keys).foldLeft(2)(math.max)
    val fallback = nullif(lastLabels(h, 2), lit("")) // implicit `*` rule
    // ascending fold nests so the LONGEST suffix length is checked first
    val ladder = (2 to maxK).foldLeft(fallback) { (els, k) =>
      val conds =
        byLen.get(k).map(set => lastLabels(h, k).isin(set: _*)).toSeq ++
          // `*.tail`: last k-1 labels equal the tail AND a k-th label exists
          wildByLen.get(k).map(tails =>
            lastLabels(h, k - 1).isin(tails: _*) && lastLabels(h, k) =!= "")
      if (conds.isEmpty) els
      else when(conds.reduce(_ || _), nullif(lastLabels(h, k + 1), lit(""))).otherwise(els)
    }
    // exception rules prevail over EVERY other match (PSL algorithm);
    // the domain is the rule itself whenever the host ends in it.
    // Fold in ASCENDING length order so the LONGEST rule nests outermost
    // — groupBy returns an unordered Map, and without the sort two
    // exception rules of different lengths both matching a host would
    // resolve by Map iteration order (diverging from the oracle SQL's
    // descending sort and the DataFrame tier's ascending fold)
    val withExc = excRules.groupBy(_.count(_ == '.') + 1)
      .toSeq.sortBy(_._1)
      .foldLeft(ladder) { case (els, (n, rules)) =>
        when(lastLabels(h, n).isin(rules: _*), lastLabels(h, n)).otherwise(els)
      }
    when(!h.startsWith("["), withExc)
  }

  /** Lower, dedupe and split a PSL rule list into (exception rules
    * without `!`, wildcard tails without `*.`, normal rules), validating
    * each class. Shared by both resolution tiers and the oracle-SQL
    * generator so the three can never disagree on rule parsing.
    */
  private[graft] def splitRules(
      suffixes: Seq[String]): (Seq[String], Seq[String], Seq[String]) = {
    val lowered = suffixes.map(_.toLowerCase).distinct
    val (excRaw, rest) = lowered.partition(_.startsWith("!"))
    val (wildRaw, normals) = rest.partition(_.startsWith("*."))
    def bare(s: String): Boolean =
      s.nonEmpty && !s.startsWith(".") && !s.endsWith(".") &&
        !s.contains("*") && !s.contains("!")
    val excRules = excRaw.map(_.substring(1))
    val wildTails = wildRaw.map(_.substring(2))
    require(normals.forall(bare),
      "suffixes must be bare dotted labels, '*.<suffix>' wildcards or '!<suffix>' exceptions")
    require(wildTails.forall(bare),
      "wildcard rules must be '*.<bare dotted suffix>' (one leading '*.' only)")
    require(excRules.forall(r => bare(r) && r.contains(".")),
      "exception rules must be '!<multi-label suffix>' (the rule minus '!' is the domain)")
    (excRules, wildTails, normals)
  }

  /** Tracking parameters stripped by [[canonicalize]] — the common
    * analytics/click identifiers that make one logical page look like
    * thousands of distinct URLs to a crawl-frontier or URL-dedup key.
    * Case-insensitive via explicit `[Uu]`-style classes (the shared
    * Java/RE2 syntax discipline bans `(?i)`), because real-world query
    * strings carry `UTM_SOURCE=` as often as `utm_source=`.
    */
  val TrackingParamsRe: String =
    "([Uu][Tt][Mm]_[A-Za-z0-9]*|[Ff][Bb][Cc][Ll][Ii][Dd]|[Gg][Cc][Ll][Ii][Dd]|" +
      "[Mm][Ss][Cc][Ll][Kk][Ii][Dd]|[Mm][Cc]_[Ee][Ii][Dd]|" +
      "[Ii][Gg][Ss][Hh][Ii][Dd]|[Rr][Ee][Ff]_[Ss][Rr][Cc])"

  /** The full strip pattern over a query string: one-or-more CONSECUTIVE
    * tracking params (valued `fbclid=x` or valueless bare `fbclid`),
    * each terminated by `&` or end-of-string so a prefix like
    * `fbclid_other=x` never matches. Consuming the run's separators in
    * one match (rather than one param per match) is what lets adjacent
    * tracking params (`fbclid&gclid&a=1`) strip in a single pass —
    * a per-param pattern would skip every second one because the scan
    * resumes AFTER the consumed separator. Replacement keeps group 1
    * (the leading `^`/`&`), so surviving params stay joined.
    */
  val TrackingStripRe: String =
    "(^|&)(?:" + TrackingParamsRe + "(?:=[^&]*)?(?:&|$))+"

  /** Canonical URL for dedup / crawl-frontier keying: lowercased scheme
    * and host, userinfo dropped, default ports dropped (http:80,
    * https:443), empty path becomes "/", tracking parameters stripped
    * ([[TrackingParamsRe]]), remaining query parameters SORTED
    * (bytewise), fragment dropped. NULL for non-absolute-URL cells.
    *
    * All codegen'd builtins — the tracking strip is a regexp_replace
    * chain (match-and-keep-separator, then collapse '&&' runs and trim
    * edge '&'s), the param sort is split + sort_array + array_join; no
    * lambda HOFs. Engine-replayable: the oracle (q102) runs the same
    * chain with list_sort. Two URLs that differ only in param order,
    * fragment, default port, userinfo or tracking noise canonicalize to
    * the same key — the property the spec pins.
    *
    * Like [[registrableDomainOfHost]], this references its input ~12
    * times (scheme/host/port/path/query each re-derive from `c`). When
    * the URL is itself an expensive expression, materialize it in its
    * own projection first and canonicalize the ATTRIBUTE — inlining a
    * large derivation at every reference blows the 64 KB whole-stage
    * codegen limit and the stage falls back to interpreted eval (seen
    * on q102's synthetic-URL decoration, r11).
    */
  def canonicalize(c: Column): Column = {
    val scheme = urlScheme(c)
    val host = urlHost(c)
    val port = urlPort(c)
    val keepPort = port.isNotNull &&
      !(scheme === "http" && port === 80) &&
      !(scheme === "https" && port === 443)
    val rawPath = urlPath(c)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val q = urlQuery(c)
    val stripped = regexp_replace(
      regexp_replace(
        regexp_replace(q, TrackingStripRe, "$1"),
        "&&+", "&"),
      "^&+|&+$", "")
    val sortedQ = array_join(sort_array(split(stripped, "&")), "&")
    when(scheme.isNotNull && host.isNotNull,
      concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port.cast("string"))).otherwise(lit("")),
        path,
        when(q.isNotNull && sortedQ =!= "", concat(lit("?"), sortedQ))
          .otherwise(lit(""))))
  }

  /** DataFrame tier of [[registrableDomain]] for full-size suffix tables
    * (the real PSL is ~10k rules — too big to inline as plan literals):
    * one broadcast LEFT join per suffix label-count and rule kind
    * (normal / `*.` wildcard / `!` exception) against the host's
    * last-k-labels candidate, then the same longest-match ladder with
    * exceptions prevailing. `suffixDf` needs a string column
    * `suffixCol`; everything stays map-side (the suffix table
    * broadcasts, nothing shuffles).
    */
  def withRegistrableDomain(
      df: org.apache.spark.sql.DataFrame,
      urlCol: String,
      outCol: String,
      suffixDf: org.apache.spark.sql.DataFrame,
      suffixCol: String = "suffix"): org.apache.spark.sql.DataFrame = {
    val low = suffixDf.select(lower(col(suffixCol)).as("__raw")).distinct()
    val exc = low.where(col("__raw").startsWith("!"))
      .select(expr("substring(__raw, 2)").as("__sfx"))
      .select(col("__sfx"), size(split(col("__sfx"), "[.]")).as("__sfx_k"))
    // wildcard rule length counts the `*` label; the join key is the tail
    val wild = low.where(col("__raw").startsWith("*."))
      .select(expr("substring(__raw, 3)").as("__tail"))
      .select(col("__tail"), (size(split(col("__tail"), "[.]")) + 1).as("__sfx_k"))
    val norm = low
      .where(!col("__raw").startsWith("!") && !col("__raw").startsWith("*."))
      .select(col("__raw").as("__sfx"),
        size(split(col("__raw"), "[.]")).as("__sfx_k"))
      .where(col("__sfx_k") >= 2) // single-label rules == the fallback
    // the suffix table is small by contract; one tiny job for the max k
    val ks = norm.select(col("__sfx_k"))
      .union(wild.select(col("__sfx_k")))
      .union(exc.select(col("__sfx_k")))
      .agg(coalesce(max(col("__sfx_k")), lit(2)).as("m")).first().getInt(0)
    val host = urlHost(col(urlCol))
    var out = df.withColumn("__host", host)
    (2 to ks).foreach { k =>
      out = out
        .withColumn(s"__last$k", lastLabels(col("__host"), k))
        .join(
          broadcast(norm.where(col("__sfx_k") === k).select(col("__sfx").as(s"__m$k"))),
          col(s"__last$k") === col(s"__m$k"), "left")
        .join(
          broadcast(wild.where(col("__sfx_k") === k).select(col("__tail").as(s"__w$k"))),
          lastLabels(col("__host"), k - 1) === col(s"__w$k"), "left")
        .join(
          broadcast(exc.where(col("__sfx_k") === k).select(col("__sfx").as(s"__e$k"))),
          col(s"__last$k") === col(s"__e$k"), "left")
    }
    val fallback = nullif(lastLabels(col("__host"), 2), lit(""))
    val base = (2 to ks).foldLeft(fallback) { (els, k) =>
      when(col(s"__m$k").isNotNull ||
          (col(s"__w$k").isNotNull && col(s"__last$k") =!= ""),
        nullif(lastLabels(col("__host"), k + 1), lit(""))).otherwise(els)
    }
    // exceptions prevail over every other match (PSL algorithm)
    val ladder = (2 to ks).foldLeft(base) { (els, k) =>
      when(col(s"__e$k").isNotNull, col(s"__last$k")).otherwise(els)
    }
    out
      .withColumn(outCol, when(!col("__host").startsWith("["), ladder))
      .drop((Seq("__host") ++
        (2 to ks).flatMap(k => Seq(s"__last$k", s"__m$k", s"__w$k", s"__e$k"))): _*)
  }
}
