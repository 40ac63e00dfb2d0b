package graft.functions

/** Bundled public-suffix snapshot for eTLD+1 (registrable-domain)
  * extraction — the keying precision tier above [[Url.urlDomain]]'s
  * last-two-label heuristic, which maps every `*.co.uk`-style host to
  * the suffix itself (`co.uk`) and therefore lumps all UK sites into
  * one per-domain-cap bucket (L36).
  *
  * Scope and honesty notes:
  *  - Only MULTI-LABEL rules are listed. Single-label public suffixes
  *    (`com`, `org`, `uk`, ...) resolve to "last two labels" — exactly
  *    the implicit `*` rule of the Public Suffix List for unlisted
  *    TLDs — so listing them changes nothing; the fallback IS the
  *    correct PSL default for them.
  *  - This is a curated SNAPSHOT subset of publicsuffix.org (the
  *    common ccTLD second-level registries plus a few high-volume
  *    private suffixes and the live wildcard sections), not the full
  *    ~10k-rule list. Wildcard (`*.ck`) and exception (`!www.ck`)
  *    rules are supported with full PSL semantics in both resolution
  *    tiers. Callers with the full list pass their own `Seq[String]`
  *    (column tier, [[Url.registrableDomain]]) or a DataFrame
  *    (broadcast-join tier, [[Url.withRegistrableDomain]]) — the
  *    resolution logic is identical.
  */
object PublicSuffix {

  /** Multi-label public suffixes: ccTLD second-level registries. */
  val CcSecondLevel: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "plc.uk",
    "ltd.uk", "sch.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    // South Africa
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    // Mexico
    "com.mx", "org.mx", "gob.mx", "edu.mx", "net.mx",
    // India
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "ac.in", "edu.in", "gov.in", "res.in", "nic.in", "mil.in",
    // South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    // Taiwan
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    // Singapore
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    // Hong Kong
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    // Israel
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    // Turkey
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "bel.tr",
    // Argentina
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar",
    // Ukraine
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    // Indonesia
    "co.id", "or.id", "net.id", "web.id", "ac.id", "sch.id", "go.id",
    // Malaysia
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
    // Thailand
    "co.th", "in.th", "or.th", "ac.th", "go.th", "net.th", "mi.th",
    // Vietnam
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    // Philippines
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    // Kenya
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    // Nigeria, Egypt, Saudi Arabia, Pakistan, Bangladesh
    "com.ng", "org.ng", "gov.ng", "edu.ng",
    "com.eg", "org.eg", "gov.eg", "edu.eg",
    "com.sa", "org.sa", "gov.sa", "edu.sa",
    "com.pk", "org.pk", "gov.pk", "edu.pk",
    "com.bd", "org.bd", "gov.bd", "edu.bd",
    // Russia, Poland, Europe misc
    "com.ru", "org.ru", "net.ru", "ac.ru",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "co.at", "or.at", "ac.at", "gv.at",
    "co.hu", "org.hu", "info.hu",
    "com.pt", "edu.pt", "gov.pt", "org.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr")

  /** Multi-label PRIVATE-section suffixes (hosting platforms where each
    * subdomain is an independent registrant — exactly the hosts a
    * per-domain cap must NOT lump together).
    */
  val PrivateSection: Seq[String] = Seq(
    "github.io", "gitlab.io", "githubusercontent.com", "blogspot.com",
    "herokuapp.com", "appspot.com", "netlify.app", "vercel.app",
    "pages.dev", "workers.dev", "web.app", "firebaseapp.com",
    "azurewebsites.net", "cloudfront.net", "fastly.net", "wixsite.com",
    "readthedocs.io", "neocities.org",
    // 3-label entries exercise the k=3 resolution tier
    "s3.amazonaws.com", "compute.amazonaws.com", "elb.amazonaws.com",
    "cdn.cloudflare.net")

  /** Wildcard and exception rules, from the PSL's live wildcard
    * sections: every label directly under these ccTLDs is itself a
    * public suffix (`*.ck` — any `<x>.ck` is a registry), except the
    * explicitly carved-out registrants (`!www.ck`).
    */
  val WildcardRules: Seq[String] = Seq(
    "*.ck", "!www.ck", // Cook Islands: the canonical PSL example pair
    "*.er", "*.kh", "*.mm", "*.np")

  /** The default snapshot: registry + private + wildcard sections. */
  val Snapshot: Seq[String] = CcSecondLevel ++ PrivateSection ++ WildcardRules
}
