package graft.dedup

import graft.SparkSpec

class RemoveDupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], w: Int) =
    Dedup.removeDupSpans(rows.toDF("id", "text"), "id", "text", w)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap

  test("a span shared by two docs is excised from both") {
    val got = run(Seq(
      1L -> "aa bb cc dd ee xx yy",
      2L -> "zz aa bb cc dd ee qq"), w = 5)
    // "aa bb cc dd ee" occurs in both → its 5 positions drop from each
    assert(got(1L) == ((7, 5, "xx yy")))
    assert(got(2L) == ((7, 5, "zz qq")))
  }

  test("within-doc repetition alone does not trigger removal") {
    val got = run(Seq(
      1L -> "aa bb cc dd ee aa bb cc dd ee",
      2L -> "totally different words here now"), w = 5)
    assert(got(1L)._2 == 0)
    assert(got(1L)._3 == "aa bb cc dd ee aa bb cc dd ee")
  }

  test("overlapping duplicated spans merge their coverage") {
    val got = run(Seq(
      1L -> "aa bb cc dd ee ff gg",
      2L -> "aa bb cc dd ee ff hh"), w = 5)
    // shared run "aa bb cc dd ee ff" = two overlapping 5-windows →
    // positions 0..5 covered in both docs
    assert(got(1L) == ((7, 6, "gg")))
    assert(got(2L) == ((7, 6, "hh")))
  }

  test("docs shorter than w pass through untouched") {
    val got = run(Seq(1L -> "one two", 2L -> "one two"), w = 5)
    assert(got(1L) == ((2, 0, "one two")))
    assert(got(2L) == ((2, 0, "one two")))
  }

  test("a fully-duplicated doc cleans to the empty string") {
    val got = run(Seq(
      1L -> "aa bb cc dd ee",
      2L -> "aa bb cc dd ee"), w = 5)
    assert(got(1L) == ((5, 5, "")))
    assert(got(2L) == ((5, 5, "")))
  }
}
