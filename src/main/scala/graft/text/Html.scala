package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML-to-text extraction — the first transform a crawl-derived corpus
  * runs (C4, RefinedWeb, and every web pipeline start from markup, not
  * prose). Script/style/comment payloads are dropped wholesale (their
  * content is code, not text), remaining tags become word boundaries,
  * the common entities decode, and whitespace collapses.
  *
  * All `regexp_replace` column expressions — codegen'd, one narrow
  * projection, no UDF, no shuffle, no HTML parser dependency. The
  * patterns stay inside the RE2-compatible subset (the [[Pii]]
  * convention: inline `(?is)` flags, non-greedy repetition, no
  * lookaround) so a SQL oracle re-derives the extraction with the same
  * pattern text. A regex pass is the right altitude for corpus-scale
  * boilerplate stripping; a spec-complete DOM parse (malformed-tag
  * recovery, CDATA, conditional comments) belongs in a codec-tier
  * `mapPartitions` like the multimodal decoders if ever needed.
  */
object Html {

  /** Containers whose PAYLOAD must vanish with the tags. Non-greedy so
    * adjacent blocks don't fuse; (?is) because crawls mix case and
    * scripts span lines. Unclosed blocks (truncated pages) are left for
    * the generic tag pass rather than eating the rest of the document.
    * Spelled as two alternatives, not a backreference — RE2 (the oracle
    * engine) has none.
    */
  val DropBlockPattern =
    "(?is)<script\\b[^>]*>.*?</script\\s*>|<style\\b[^>]*>.*?</style\\s*>"

  /** HTML comments, dotall non-greedy. */
  val CommentPattern = "(?s)<!--.*?-->"

  /** Any remaining tag: `<` + name-ish start + up to `>`. The name-ish
    * guard keeps bare inequalities in prose ("a < b") intact.
    */
  val TagPattern = "</?[A-Za-z][^>]*>"

  /** The five named entities every pipeline decodes + decimal/hex
    * numeric escapes for the ASCII range, `&amp;` strictly LAST so
    * double-escaped text decodes exactly one level per pass.
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Markup → text: drop script/style payloads and comments, turn tags
    * into spaces (word boundaries — `<br>`/`</p>` separate words),
    * decode entities, collapse whitespace, trim. Null stays null.
    */
  def toText(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(html, DropBlockPattern, " "), CommentPattern, " ")
    val noTags = regexp_replace(noBlocks, TagPattern, " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (ent, ch)) =>
      // literal replace(), not regexp: entity text is plain, and both
      // engines ("replace" here, DuckDB replace() in the oracle) treat
      // it verbatim — no regex-metachar escaping to keep in sync
      replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Append `<htmlCol>_text` = extracted text. */
  def stripHtml(df: DataFrame, htmlCol: String): DataFrame =
    df.withColumn(s"${htmlCol}_text", toText(col(htmlCol)))

  /** A complete `<a …>…</a>` element, non-greedy so adjacent anchors
    * don't fuse; (?is) for case and multi-line anchors.
    */
  val AnchorPattern = "(?is)<a\\b[^>]*>.*?</a\\s*>"

  /** Double-quoted href inside an anchor's open tag. Crawl pipelines
    * normalize to the quoted form; unquoted/single-quoted hrefs are
    * left to [[toText]]'s tag stripping rather than half-parsed.
    */
  val HrefPattern = "(?i)\\bhref\\s*=\\s*\"([^\"]*)\""

  /** Link-graph extraction — the edge list behind crawl-frontier
    * prioritization and [[graft.graph.PageRank]] domain authority:
    * one (id, link_idx, href, anchor) row per `<a href="…">` in
    * document order, `anchor` = the element's text content through the
    * same [[toText]] chain the body takes.
    *
    * Shape: `regexp_extract_all` pulls the anchor elements as one
    * in-row array, href/anchor derive per element inside the same
    * projection, and `posexplode` emits the edges — one narrow
    * codegen'd stage, no UDF, no shuffle; the output is the edge list,
    * so downstream graph work starts already exploded.
    */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String)
      : DataFrame = {
    val anchors = regexp_extract_all(col(htmlCol), lit(AnchorPattern), lit(0))
    df.select(col(idCol), posexplode(anchors).as(Seq("link_idx", "__a")))
      .select(col(idCol), col("link_idx"),
        // search ONLY the open tag: an href-shaped string in the
        // anchor's TEXT content must not mint a link edge
        regexp_extract(
          regexp_extract(col("__a"), "(?is)\\A<a\\b[^>]*>", 0),
          HrefPattern, 1).as("href"),
        toText(regexp_replace(col("__a"), "(?is)\\A<a\\b[^>]*>|</a\\s*>\\z", " "))
          .as("anchor"))
      .where(col("href") =!= "")
  }
}
