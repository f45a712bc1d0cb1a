package graft.text

import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org XML) — robots.txt's companion file
  * and the OTHER half of crawl politeness: robots says where a crawler
  * must not go, the sitemap says where the site wants it to go (with
  * freshness and priority hints a recrawl scheduler feeds on). A
  * crawl-loop that seeds frontiers from sitemaps covers the long tail
  * of unlinked pages that PageRank-ordered frontier expansion never
  * reaches.
  *
  * Parses both document kinds: `<urlset>` (leaf sitemaps → one row per
  * `<url>` with loc/lastmod/priority; entries without a `<loc>` drop)
  * and `<sitemapindex>` (index files → one `kind='sitemap'` row per
  * child, the recursion edge the caller's crawl loop follows). XML
  * loads through a doctype-disallowing SAX parser — sitemaps are
  * UNTRUSTED crawl content and entity expansion (billion-laughs, XXE)
  * must die at the parser, not in review. Malformed documents emit
  * nothing (the decode-quarantine convention).
  *
  * Scale shape: sitemap tables are domain-sized like robots tables;
  * one narrow flatMap pass, no shuffle — output rows carry only
  * (domain, kind, loc, lastmod, priority).
  */
object Sitemap {

  private def secureLoad(s: String): Option[scala.xml.Elem] = try {
    val f = javax.xml.parsers.SAXParserFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl",
      true)
    f.setFeature(
      "http://xml.org/sax/features/external-general-entities", false)
    f.setFeature(
      "http://xml.org/sax/features/external-parameter-entities", false)
    f.setNamespaceAware(false)
    Some(scala.xml.XML.withSAXParser(f.newSAXParser).loadString(s))
  } catch { case NonFatal(_) => None }

  /** One row per sitemap entry: (domain, kind, loc, lastmod,
    * priority) — kind is 'url' for leaf entries, 'sitemap' for index
    * children; lastmod stays the raw string (W3C datetime parsing is
    * the caller's `v5` territory), priority a double or null.
    */
  def entries(sitemaps: DataFrame, domainCol: String, xmlCol: String)
      : DataFrame = {
    val spark = sitemaps.sparkSession
    import spark.implicits._
    sitemaps.select(lower(col(domainCol)).cast("string"),
        col(xmlCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (dom, xml) =>
        secureLoad(Option(xml).getOrElse("")).toSeq.flatMap { root =>
          def txt(n: scala.xml.NodeSeq): Option[String] = {
            val t = n.text.trim
            if (t.isEmpty) None else Some(t)
          }
          root.label match {
            case "urlset" =>
              (root \ "url").flatMap { u =>
                txt(u \ "loc").map { loc =>
                  (dom, "url", loc, txt(u \ "lastmod"),
                    txt(u \ "priority").flatMap(_.toDoubleOption))
                }
              }
            case "sitemapindex" =>
              (root \ "sitemap").flatMap { sm =>
                txt(sm \ "loc").map { loc =>
                  (dom, "sitemap", loc, txt(sm \ "lastmod"),
                    Option.empty[Double])
                }
              }
            case _ => Seq.empty // not a sitemap document: quarantine
          }
        }
      }
      .toDF(domainCol, "kind", "loc", "lastmod", "priority")
  }
}
