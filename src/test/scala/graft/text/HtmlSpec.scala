package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(Tuple1(html)).toDF("h")
      .select(Html.toText(col("h")).as("t")).head().getString(0)

  test("tags become word boundaries; whitespace collapses") {
    assert(strip("<p>one</p><p>two</p>") == "one two")
    assert(strip("line<br/>break") == "line break")
    assert(strip("  <div> spaced\n\tout </div> ") == "spaced out")
  }

  test("script and style payloads vanish wholesale, across lines and case") {
    assert(strip("<SCRIPT type='x'>var a = 1 < 2;\nalert('hi')</script>keep")
      == "keep")
    assert(strip("a<style>.c{color:red}</style>b") == "a b")
    // adjacent blocks don't fuse (non-greedy): the text between survives
    assert(strip("<script>x</script>MID<script>y</script>") == "MID")
    // unclosed script (truncated page): generic tag pass still strips
    // the opening tag instead of the block pattern eating the document
    assert(strip("<script>tail text") == "tail text")
  }

  test("comments drop; entities decode exactly one level, &amp; last") {
    assert(strip("a<!-- hidden\nacross lines -->b") == "a b")
    assert(strip("&lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;&amp; more")
      == "<tag> \"q\" 's' & more")
    // double-escaped: &amp;lt; must become the TEXT "&lt;", not "<"
    assert(strip("&amp;lt;") == "&lt;")
  }

  test("prose inequalities survive the tag pattern; null stays null") {
    assert(strip("for a < b and x > y") == "for a < b and x > y")
    val r = Seq(Tuple1(null: String)).toDF("h")
      .select(Html.toText(col("h"))).head()
    assert(r.isNullAt(0))
  }

  private def links(html: String): Seq[(Int, String, String)] =
    Html.extractLinks(Seq((1L, html)).toDF("id", "h"), "id", "h")
      .select(col("link_idx"), col("href"), col("anchor"))
      .as[(Int, String, String)].collect().toSeq

  test("extractLinks: document-ordered edges with href and cleaned " +
      "anchor text") {
    val html = """<p>intro</p><a href="http://a.com/1">first <b>link</b></a>
      |mid <A HREF="http://b.com/2" class=x>second &amp; last</A>""".stripMargin
    assert(links(html) == Seq(
      (0, "http://a.com/1", "first link"),
      (1, "http://b.com/2", "second & last")))
  }

  test("extractLinks: href-shaped TEXT inside an anchor body never " +
      "mints an edge — only the open tag is searched") {
    assert(links("""<a name="x">use href="http://spam.example/" ok</a>""")
      .isEmpty)
    assert(links("""<a href="http://real/">text href="http://fake/"</a>""")
      .map(_._2) == Seq("http://real/"))
  }

  test("extractLinks: anchors without a double-quoted href drop; " +
      "adjacent anchors don't fuse; multi-line anchors parse") {
    assert(links("""<a name="x">no href</a><a href=bare>unquoted</a>""")
      .isEmpty)
    assert(links("""<a href="u1">one</a><a href="u2">two</a>""")
      .map(_._2) == Seq("u1", "u2"))
    assert(links("<a\nhref=\"u\"\n>across\nlines</a>") ==
      Seq((0, "u", "across lines")))
  }
}
