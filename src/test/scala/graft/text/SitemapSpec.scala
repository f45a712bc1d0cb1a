package graft.text

import graft.SparkSpec

class SitemapSpec extends SparkSpec {
  import spark.implicits._

  test("urlset entries parse loc/lastmod/priority; missing fields go " +
      "null; entries without loc drop; index files emit recursion rows") {
    val docs = Seq(
      ("A.com", "<urlset>" +
        "<url><loc>http://a.com/1</loc><lastmod>2024-02-03</lastmod>" +
        "<priority>0.8</priority></url>" +
        "<url><loc>http://a.com/2</loc></url>" +
        "<url><lastmod>2024-01-01</lastmod></url>" + // no loc: drops
        "</urlset>"),
      ("b.com", "<sitemapindex>" +
        "<sitemap><loc>http://b.com/s1.xml</loc>" +
        "<lastmod>2024-03-01</lastmod></sitemap>" +
        "<sitemap><loc>http://b.com/s2.xml</loc></sitemap>" +
        "</sitemapindex>"))
      .toDF("domain", "xml")
    val out = Sitemap.entries(docs, "domain", "xml")
      .as[(String, String, String, Option[String], Option[Double])]
      .collect().toSet
    assert(out == Set(
      ("a.com", "url", "http://a.com/1", Some("2024-02-03"), Some(0.8)),
      ("a.com", "url", "http://a.com/2", None, None),
      ("b.com", "sitemap", "http://b.com/s1.xml", Some("2024-03-01"),
        None),
      ("b.com", "sitemap", "http://b.com/s2.xml", None, None)))
  }

  test("malformed XML, non-sitemap roots, and doctype bombs all " +
      "quarantine silently instead of parsing") {
    val laughs = "<?xml version=\"1.0\"?><!DOCTYPE lolz [" +
      "<!ENTITY lol \"lol\"><!ENTITY lol2 \"&lol;&lol;&lol;\">]>" +
      "<urlset><url><loc>&lol2;</loc></url></urlset>"
    val docs = Seq(
      ("x.com", "<urlset><url><loc>http://x.com/ok</loc></url></urlset>"),
      ("y.com", "<urlset><url><loc>broken"),         // truncated
      ("z.com", "<html><body>not a sitemap</body></html>"),
      ("w.com", laughs))                              // doctype: rejected
      .toDF("domain", "xml")
    val out = Sitemap.entries(docs, "domain", "xml")
      .as[(String, String, String, Option[String], Option[Double])]
      .collect()
    assert(out.toSeq == Seq(
      ("x.com", "url", "http://x.com/ok", None, None)))
  }

  test("a non-numeric priority degrades to null, not a crash") {
    val docs = Seq(("a.com", "<urlset><url><loc>u</loc>" +
      "<priority>high</priority></url></urlset>")).toDF("d", "x")
    val out = Sitemap.entries(docs, "d", "x")
      .as[(String, String, String, Option[String], Option[Double])]
      .collect()
    assert(out.toSeq == Seq(("a.com", "url", "u", None, None)))
  }
}
