package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val txt =
    """# crawl policy
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /*.zip$
      |
      |User-agent: *
      |Disallow: /
      |Allow: /public
      |""".stripMargin

  test("group selection: exact agent group wins; * is the fallback; " +
      "a run of User-agent lines shares one group") {
    val g = Robots.parse(txt, "GraftBot")
    assert(g == Seq((false, "/private"), (true, "/private/ok"),
      (false, "/*.zip$")))
    assert(Robots.parse(txt, "otherbot") == g) // shared agent run
    assert(Robots.parse(txt, "strangerbot") ==
      Seq((false, "/"), (true, "/public")))
  }

  test("longest match wins, Allow beats Disallow on ties, no match " +
      "means allowed") {
    val rs = Robots.parse(txt, "graftbot")
    assert(Robots.decide("/public/page", rs))          // no match
    assert(!Robots.decide("/private/page", rs))        // Disallow /private
    assert(Robots.decide("/private/ok/page", rs))      // longer Allow
    assert(!Robots.decide("/private", rs))             // exact prefix
    assert(Robots.decide("/anything", Seq.empty))      // no rules
    // tie: same length, Allow wins
    assert(Robots.decide("/abc", Seq((false, "/abc"), (true, "/abc"))))
  }

  test("wildcard and end-anchor matching per RFC 9309") {
    assert(Robots.matches("/files/a.zip", "/*.zip$"))
    assert(!Robots.matches("/files/a.zipx", "/*.zip$"))
    assert(Robots.matches("/files/a.zipx", "/*.zip"))
    assert(Robots.matches("/a/b/c", "/a/*/c"))
    assert(!Robots.matches("/a/b/d", "/a/*/c$"))
    assert(Robots.matches("/exact", "/exact$"))
    assert(!Robots.matches("/exactly", "/exact$"))
    // multiple wildcards walk left to right
    assert(Robots.matches("/x1y2z", "/x*y*z$"))
  }

  test("empty-pattern rules drop; rules before any User-agent line drop") {
    val t = "Disallow: /orphan\nUser-agent: *\nDisallow:\nAllow: /ok"
    assert(Robots.parse(t, "any") == Seq((true, "/ok")))
  }

  test("mixed-case robots domains still bind their rules; null URLs " +
      "pass through allowed; query-only URLs match query rules") {
    val robots = Seq(
      ("Example.COM", "User-agent: *\nDisallow: /"),
      ("q.com", "User-agent: *\nDisallow: /*?*sessionid=*"))
      .toDF("domain", "txt")
    val urls = Seq(
      (1L, "http://example.com/x"),
      (2L, null.asInstanceOf[String]),
      (3L, "http://q.com?sessionid=9"),
      (4L, "http://q.com?page=2")).toDF("id", "url")
    val m = Robots.withAllowed(urls, "url",
        Robots.rules(robots, "domain", "txt", "bot"))
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(m == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
    assert(Robots.pathOf("http://h?sessionid=1") == "/?sessionid=1")
    assert(Robots.pathOf("http://h") == "/")
  }

  test("distributed filter: frontier never shuffles, missing robots " +
      "means allowed") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /private"),
      ("b.com", "User-agent: *\nDisallow: /")).toDF("domain", "txt")
    val urls = Seq(
      (1L, "http://a.com/public/x"),
      (2L, "http://a.com/private/x"),
      (3L, "http://b.com/anything"),
      (4L, "http://c.com/no/robots/here")).toDF("id", "url")
    val out = Robots.withAllowed(urls, "url",
      Robots.rules(robots, "domain", "txt", "graftbot"))
    assert(out.columns.toSeq == Seq("id", "url", "allowed"))
    val m = out.as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(m == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
    val kept = Robots.filterAllowed(urls, "url", robots, "domain", "txt",
      "graftbot")
    assert(kept.select("id").as[Long].collect().toSet == Set(1L, 4L))
    // plan: broadcast join only — the frontier side has no Exchange
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Exchange hashpartitioning"), p)
  }
}
