package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt compliance (RFC 9309) — the gate between a crawl frontier
  * and a fetch queue: parse each domain's robots.txt into per-agent
  * rule groups, then filter candidate URLs by the longest-match
  * allow/disallow decision. A training-data pipeline that republishes
  * crawl-derived text carries this filter or inherits the liability.
  *
  * Parsing (per the RFC):
  *   - groups are runs of `User-agent:` lines followed by rules; a
  *     `User-agent:` line AFTER rules starts a new group;
  *   - the agent matches a group by case-insensitive token equality,
  *     with `*` as fallback — if any exact group exists, ONLY exact
  *     groups apply;
  *   - empty-pattern rules ("Disallow:" = allow everything) drop.
  * Matching: longest-pattern-wins, `Allow` beats `Disallow` on ties;
  * `*` wildcards and the `$` end anchor are honored; no rules for a
  * domain (or no robots.txt) means allowed — the RFC default.
  *
  * Scale shape: robots.txt tables are DOMAIN-sized (a ~100 TB crawl has
  * ~10⁷ domains, two orders below its page count), so rules parse in
  * one narrow pass and the filter is a broadcast-grouped join: the URL
  * corpus NEVER shuffles — domain extraction, the rules lookup, and
  * the match loop all ride one projection over the frontier. Rule
  * evaluation is a JVM kernel (wildcard matching is a state walk, not
  * a column expression); the per-URL work is bounded by the domain's
  * rule count.
  */
object Robots {

  /** (domain, allow, pattern) rules applying to `agent`, one row per
    * rule, parsed from (domainCol, txtCol) rows.
    */
  def rules(robots: DataFrame, domainCol: String, txtCol: String,
      agent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    // domain lowercased HERE so it meets [[withAllowed]]'s lowercased
    // URL-host extraction — a mixed-case robots key must not silently
    // disable its rules
    robots.select(lower(col(domainCol)).cast("string"),
        col(txtCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (dom, txt) =>
        parse(Option(txt).getOrElse(""), agent)
          .map { case (allow, pat) => (dom, allow, pat) }
      }
      .toDF("domain", "allow", "pattern")
  }

  /** Append `allowed` to a frontier of (urlCol) rows under the parsed
    * `rulesDf` ((domain, allow, pattern), as from [[rules]]). The rules
    * table is grouped domain-wise and BROADCAST; the frontier stays in
    * place — no shuffle at any width.
    */
  def withAllowed(urls: DataFrame, urlCol: String,
      rulesDf: DataFrame): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val grouped = rulesDf
      .groupBy(col("domain"))
      .agg(collect_list(struct(col("allow"), col("pattern"))).as("rs"))
    val withDom = urls.withColumn("__dom",
      lower(regexp_extract(col(urlCol), WebCuration.DomainPattern, 1)))
    val joined = withDom
      .join(broadcast(grouped), withDom("__dom") === grouped("domain"),
        "left")
      .drop("domain")
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.types.StructType(joined.schema.fields.dropRight(1))
        .add("allowed", org.apache.spark.sql.types.BooleanType))
    val urlIdx = joined.schema.fieldIndex(urlCol)
    val rsIdx = joined.schema.fieldIndex("rs")
    joined.map { r =>
      val rs =
        if (r.isNullAt(rsIdx)) Seq.empty
        else r.getSeq[org.apache.spark.sql.Row](rsIdx)
          .map(x => (x.getBoolean(0), x.getString(1)))
      // a null URL row passes through as allowed (no subject to match)
      // rather than crashing the task — the quarantine posture
      val url = r.getString(urlIdx)
      val verdict = if (url == null) true else decide(pathOf(url), rs)
      org.apache.spark.sql.Row.fromSeq(r.toSeq.dropRight(1) :+ verdict)
    }(enc).drop("__dom")
  }

  /** One-call frontier filter: parse + evaluate, keep allowed URLs. */
  def filterAllowed(urls: DataFrame, urlCol: String, robots: DataFrame,
      domainCol: String, txtCol: String, agent: String): DataFrame =
    withAllowed(urls, urlCol, rules(robots, domainCol, txtCol, agent))
      .where(col("allowed")).drop("allowed")

  /** Parse one robots.txt body: the (allow, pattern) rules applying to
    * `agent`. Exposed for spec-level use.
    */
  def parse(txt: String, agent: String): Seq[(Boolean, String)] = {
    val a = agent.toLowerCase
    // group = (agents, rules); a User-agent line after rules opens a new
    // group per the RFC's run-of-agent-lines semantics
    val groups = scala.collection.mutable.Buffer.empty[
      (Set[String], Seq[(Boolean, String)])]
    var agents = Set.empty[String]
    var rs = Seq.empty[(Boolean, String)]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += ((agents, rs))
      agents = Set.empty; rs = Seq.empty; inRules = false
    }
    for (raw <- txt.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val field = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        field match {
          case "user-agent" =>
            if (inRules) flush()
            agents += value.toLowerCase
          case "allow" | "disallow" if agents.nonEmpty =>
            inRules = true
            if (value.nonEmpty) rs :+= (field == "allow", value)
          case _ => if (agents.nonEmpty) inRules = true // sitemap etc.
        }
      }
    }
    flush()
    val exact = groups.filter(_._1.contains(a))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_._1.contains("*"))
    chosen.toSeq.flatMap(_._2)
  }

  /** Longest-match decision; Allow wins ties; no match (or no rules)
    * means allowed.
    */
  def decide(path: String, rs: Seq[(Boolean, String)]): Boolean = {
    val hits = rs.filter { case (_, pat) => matches(path, pat) }
    if (hits.isEmpty) true
    else {
      val maxLen = hits.map(_._2.length).max
      hits.exists { case (allow, pat) => allow && pat.length == maxLen }
    }
  }

  /** RFC 9309 pattern match: anchored at the path start, `*` matches
    * any run, trailing `$` anchors the end.
    */
  def matches(path: String, pattern: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val parts = pat.split("\\*", -1)
    // greedy-enough walk: first segment anchored at 0, middle segments
    // at the earliest occurrence (earliest-match is complete for this
    // pattern class when the tail is unanchored; for an anchored tail,
    // the last segment must sit at the very end)
    if (!path.startsWith(parts.head)) return false
    var pos = parts.head.length
    val mid = if (anchored) parts.tail.dropRight(1) else parts.tail
    for (p <- mid) {
      val i = path.indexOf(p, pos)
      if (i < 0) return false
      pos = i + p.length
    }
    if (!anchored) true
    else {
      val last = parts.last
      // after the middle walk, the final segment must end the path at
      // or beyond pos (only reachable when parts has a tail)
      if (parts.length == 1) pos == path.length
      else path.length >= pos + last.length && path.endsWith(last)
    }
  }

  /** Path + query of a URL (the robots matching subject); `/` when the
    * URL has neither. A query with no path segment
    * (`http://h?sessionid=1`) normalizes to `/?sessionid=1` so
    * query-targeting rules still apply.
    */
  def pathOf(url: String): String = {
    val noFrag = url.takeWhile(_ != '#')
    val afterScheme = {
      val i = noFrag.indexOf("://")
      if (i < 0) noFrag else noFrag.substring(i + 3)
    }
    val j = afterScheme.indexOf('/')
    val q = afterScheme.indexOf('?')
    if (j >= 0 && (q < 0 || j < q)) afterScheme.substring(j)
    else if (q >= 0) "/" + afterScheme.substring(q)
    else "/"
  }
}
