package graft.text

import org.apache.spark.sql.DataFrame
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

  /** Per-domain document count and mean of `numCol` (round 4 for
    * cross-engine float parity) — one map-side-combined aggregate.
    */
  def domainStats(df: DataFrame, domainCol: String,
      numCol: String): DataFrame =
    df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("domain_docs"),
        round(avg(col(numCol)), 4).as("domain_avg"))
}
