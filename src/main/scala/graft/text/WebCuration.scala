package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-crawl curation — the domain-level gate of a crawl-derived
  * training corpus: extract each document's registrable host from its
  * URL, drop documents from blocklisted domains, and enrich survivors
  * with per-domain corpus statistics (the signal behind domain quotas
  * and boilerplate-farm detection).
  *
  * All column expressions (codegen, no UDF). The blocklist joins as a
  * broadcast ANTI join: real blocklists run to millions of domains —
  * still tens of MB, broadcastable — and the corpus side never
  * shuffles. Domain stats are one hash aggregate whose result is
  * domain-cardinality-sized, broadcast back onto the data.
  */
object WebCuration {

  /** Scheme-prefixed URL → lowercased host: skips userinfo, stops at
    * port, path, query, or fragment. Capture group 1 is the host.
    */
  val DomainPattern = "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"

  /** Append `outName` = the lowercased host of `urlCol` (empty string
    * when the URL has no scheme-prefixed authority — regexp_extract's
    * no-match convention, kept so the column stays non-null for
    * grouping).
    */
  def withDomain(df: DataFrame, urlCol: String,
      outName: String = "domain"): DataFrame =
    df.withColumn(outName,
      lower(regexp_extract(col(urlCol), DomainPattern, 1)))

  /** Drop rows whose `domainCol` appears in `blocklist` (a one-column
    * DataFrame named `blocked_domain`). Broadcast anti-join: the
    * corpus never shuffles, the blocklist ships once per executor.
    */
  def blocklistFilter(df: DataFrame, domainCol: String,
      blocklist: DataFrame): DataFrame =
    df.join(broadcast(blocklist),
      df(domainCol) === blocklist("blocked_domain"), "left_anti")

  /** Authority prefix (scheme + userinfo + host + port) — group 0 is
    * what [[canonicalizeUrl]] lowercases; everything after is the path
    * side, left case-intact (paths are case-sensitive, hosts aren't).
    */
  private val AuthorityPattern = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** Query parameters that identify a CLICK, not a resource — the
    * standard tracking set. Stripping them is what makes two crawls of
    * the same page dedup to one URL.
    */
  val TrackingParamPattern =
    "(?:utm_[A-Za-z]+|gclid|fbclid|msclkid|mc_eid|igshid)=[^&#]*"

  /** URL canonicalization — the normalize-before-dedup step of crawl
    * curation: two captures of one resource must compare equal.
    *   1. fragment dropped (client-side only),
    *   2. tracking parameters dropped (with their separator; a now-empty
    *      query loses its `?`, a leading `&` becomes `?`),
    *   3. scheme + authority lowercased (path/query case preserved),
    *   4. default ports (`http:80`, `https:443`) dropped,
    *   5. a bare authority gains no trailing slash and a lone trailing
    *      `/` after the authority is dropped (RFC 3986 §6.2.3: empty
    *      path ≡ "/").
    * Pure column expressions; non-tracking parameter ORDER is preserved
    * (reordering would conflate genuinely different cache keys).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // A RUN of adjacent tracking params — each param consuming its own
    // TRAILING separator (or end) — collapses to the run's leading
    // separator in ONE match. One match per run matters: global replace
    // never re-scans what a previous replacement produced (and RE2 has
    // no lookahead to anchor single-param matches on), so
    // "?utm_a=1&utm_b=2&x=3" must go in one bite, and consuming the
    // trailing "&" is what keeps "&gclid=g&y=2" from leaving "&&"
    // behind. The separator guard keeps "xutm_a=1" (param NAMED
    // xutm_a) and values merely containing "gclid=" intact.
    val runPattern =
      "([?&])(?:(?:" + TrackingParamPattern + ")(?:&|$))+"
    val noTrack0 = regexp_replace(noFrag, runPattern, "$1")
    // run-at-end leaves its lone leading separator dangling
    val noTrack = regexp_replace(noTrack0, "[?&]+$", "")
    val auth = lower(regexp_extract(noTrack, AuthorityPattern, 0))
    val rest = regexp_replace(noTrack, AuthorityPattern, "")
    val authNoPort = regexp_replace(
      regexp_replace(auth, "^(http://[^/?#]*):80$", "$1"),
      "^(https://[^/?#]*):443$", "$1")
    when(auth === "", noTrack) // no authority: leave the value alone
      .otherwise(concat(authNoPort,
        when(rest === "/", lit("")).otherwise(rest)))
  }

  /** Append `outName` = [[canonicalizeUrl]] of `urlCol`. */
  def withCanonicalUrl(df: DataFrame, urlCol: String,
      outName: String = "url_canonical"): DataFrame =
    df.withColumn(outName, canonicalizeUrl(col(urlCol)))

  /** Per-domain document count and mean of `numCol` (round 4 for
    * cross-engine float parity) — one map-side-combined aggregate.
    */
  def domainStats(df: DataFrame, domainCol: String,
      numCol: String): DataFrame =
    df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("domain_docs"),
        round(avg(col(numCol)), 4).as("domain_avg"))
}
