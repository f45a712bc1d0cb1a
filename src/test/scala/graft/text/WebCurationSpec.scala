package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebCurationSpec extends SparkSpec {
  import spark.implicits._

  test("withDomain lowercases the host and strips scheme, userinfo, " +
      "port, path, query, and fragment; schemeless URLs yield ''") {
    val df = Seq(
      (1L, "https://WWW.Example.COM/path?q=1"),
      (2L, "http://alice:pw@Sub.Host.org:8080/x#frag"),
      (3L, "ftp://files.example.net"),
      (4L, "no-scheme.example.com/path"),
      (5L, "s3://bucket-name/key/part")).toDF("id", "url")
    val out = WebCuration.withDomain(df, "url").orderBy("id")
      .select("domain").as[String].collect().toSeq
    assert(out == Seq("www.example.com", "sub.host.org",
      "files.example.net", "", "bucket-name"))
  }

  test("blocklistFilter drops exactly the blocked domains via a " +
      "broadcast anti-join") {
    val docs = WebCuration.withDomain(
      Seq((1L, "https://bad.com/a"), (2L, "https://good.com/b"),
        (3L, "https://bad.com/c")).toDF("id", "url"), "url")
    val bl = Seq("bad.com").toDF("blocked_domain")
    val kept = WebCuration.blocklistFilter(docs, "domain", bl)
    assert(kept.select("id").as[Long].collect().toSet == Set(2L))
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"))
  }

  test("domainStats aggregates count and rounded mean per domain") {
    val df = Seq(("a.com", 10.0), ("a.com", 20.0), ("b.com", 5.0))
      .toDF("domain", "v")
    val out = WebCuration.domainStats(df, "domain", "v")
      .orderBy("domain")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("a.com", 2L, 15.0), ("b.com", 1L, 5.0)))
  }

  private def canon(url: String): String =
    Seq(Tuple1(url)).toDF("u")
      .select(WebCuration.canonicalizeUrl(col("u"))).head().getString(0)

  test("canonicalizeUrl: tracking runs, adjacent and leading, collapse " +
      "correctly; kept params preserve order") {
    assert(canon("http://a.com/p?utm_a=1&utm_b=2&x=3") == "http://a.com/p?x=3")
    assert(canon("http://a.com/p?x=1&gclid=g&y=2") == "http://a.com/p?x=1&y=2")
    assert(canon("http://a.com/p?x=1&fbclid=f") == "http://a.com/p?x=1")
    assert(canon("http://a.com/p?utm_only=1") == "http://a.com/p")
    // param NAMED xutm_a is not a tracking param
    assert(canon("http://a.com/p?xutm_a=1") == "http://a.com/p?xutm_a=1")
    // a VALUE containing 'gclid=' is untouched (separator guard)
    assert(canon("http://a.com/p?q=zgclid=1") == "http://a.com/p?q=zgclid=1")
  }

  test("canonicalizeUrl: case, ports, fragment, trailing slash, " +
      "schemeless passthrough") {
    assert(canon("HTTP://WWW.Ex.COM:80/Path?Q=V#frag")
      == "http://www.ex.com/Path?Q=V")
    assert(canon("https://a.com:443/") == "https://a.com")
    // lone post-authority slash normalizes away regardless of port
    assert(canon("https://a.com:8443/") == "https://a.com:8443")
    assert(canon("http://a.com/deep/" ) == "http://a.com/deep/")
    assert(canon("not a url") == "not a url")
  }

  test("canonicalizeUrl is idempotent: a canonical URL maps to itself") {
    val urls = Seq(
      "HTTP://A.com:80/p?utm_a=1&x=2#f",
      "https://b.com:443/",
      "http://c.com/p?x=1&gclid=g&y=2",
      "http://User@d.com:8080/x?a=1",
      "http://e.com/p?utm_only=1",
      "not a url at all")
    urls.foreach { u =>
      val once = canon(u)
      assert(canon(once) == once, s"not idempotent for $u -> $once")
    }
  }
}
