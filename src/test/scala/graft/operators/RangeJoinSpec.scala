package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, 0.0),   // == lo of r1 -> inclusive match
    (2L, 9.99),  // just under hi of r1
    (3L, 10.0),  // == hi of r1 -> exclusive, no match; == lo of r2
    (4L, 25.0),  // inside wide r3 spanning many bins
    (5L, -3.0),  // negative domain, inside r4
    (6L, 99.0))  // no range
    .toDF("pid", "p")

  private val ranges = Seq(
    (10L, 0.0, 10.0),   // r1
    (20L, 10.0, 12.0),  // r2
    (30L, 20.0, 40.0),  // r3 spans 4+ bins at width 5
    (40L, -5.0, -1.0))  // r4 negative
    .toDF("rid", "lo", "hi")

  test("bin-bucketed range join matches brute-force inequality join") {
    for (w <- Seq(0.5, 5.0, 50.0)) {
      val got = RangeJoin.pointInInterval(points, "p", ranges, "lo", "hi", w)
        .select("pid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val brute = points.as("a").crossJoin(ranges.as("b"))
        .where($"p" >= $"lo" && $"p" < $"hi")
        .select("pid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == brute, s"binWidth=$w")
      assert(got == Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L), (5L, 40L)))
    }
  }

  test("no duplicate pairs even when a range spans many bins") {
    val out = RangeJoin.pointInInterval(points, "p", ranges, "lo", "hi", 0.1)
      .select("pid", "rid").as[(Long, Long)].collect()
    assert(out.length == out.distinct.length)
  }

  test("left-outer variant keeps unmatched points with nulled range " +
      "columns and equals the brute-force left join") {
    val got = RangeJoin.pointInIntervalLeft(
        points, "p", ranges, "lo", "hi", 5.0)
      .select("pid", "rid").as[(Long, Option[Long])]
      .collect().sorted.toSeq
    val brute = points.as("a").crossJoin(ranges.as("b"))
      .where($"p" >= $"lo" && $"p" < $"hi")
      .select($"pid", $"rid")
      .unionByName(points.join(
          points.as("a").crossJoin(ranges.as("b"))
            .where($"p" >= $"lo" && $"p" < $"hi").select("pid").distinct(),
          Seq("pid"), "left_anti")
        .select($"pid", lit(null).cast("bigint").as("rid")))
      .as[(Long, Option[Long])].collect().sorted.toSeq
    assert(got == brute)
    // point 6 (no covering range) survives with a null rid
    assert(got.contains((6L, None)))
  }

  test("left-outer variant: a matched point with a NULL attribute column " +
      "is not duplicated as unmatched") {
    // pid=2 matches r1 but carries a null tag; null-unsafe anti-join
    // equality would re-emit it as "unmatched" with a nulled rid
    val tagged = Seq(
      (1L, 0.0, Some("a")),
      (2L, 9.99, None: Option[String]),
      (6L, 99.0, None: Option[String]))
      .toDF("pid", "p", "tag")
    val got = RangeJoin.pointInIntervalLeft(
        tagged, "p", ranges, "lo", "hi", 5.0)
      .select("pid", "rid").as[(Long, Option[Long])]
      .collect().sorted.toSeq
    assert(got == Seq((1L, Some(10L)), (2L, Some(10L)), (6L, None)))
  }

  test("auto bin width (sampled median length) matches every explicit width") {
    val got = RangeJoin.pointInInterval(points, "p", ranges, "lo", "hi")
      .select("pid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L), (5L, 40L)))
  }

  test("grossly inverted intervals yield zero bins, not a huge " +
      "descending sequence") {
    val inv = Seq((90L, 1.0e12, 0.0), (91L, 24.0, 26.0)).toDF("rid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "p", inv, "lo", "hi", 5.0)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    // the valid interval still matches; the inverted one matches nothing
    // and allocates nothing
    assert(out == Set((4L, 91L)))
  }

  test("interval-overlap join matches brute force at several widths, " +
      "emits no duplicates, and treats touching intervals as disjoint") {
    val lhs = Seq(
      (1L, 0.0, 10.0),   // overlaps r1, touches r2 at 10
      (2L, 11.0, 13.0),  // inside r2
      (3L, -6.0, -4.5),  // overlaps r4 start
      (4L, 15.0, 45.0),  // spans r3 entirely
      (5L, 98.0, 99.0))  // overlaps nothing
      .toDF("aid", "alo", "ahi")
    for (w <- Seq(0.5, 5.0, 50.0)) {
      val got = RangeJoin.intervalOverlap(
          lhs, "alo", "ahi", ranges, "lo", "hi", w)
        .select("aid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val brute = lhs.crossJoin(ranges)
        .where($"alo" < $"hi" && $"lo" < $"ahi")
        .select("aid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == brute, s"binWidth=$w")
      assert(got.size == got.distinct.size, s"binWidth=$w")
      // half-open: [0,10) × [10,12) do NOT overlap
      assert(!got.contains((1L, 20L)))
      assert(got.contains((4L, 30L)) && got.contains((3L, 40L)))
    }
  }

  test("an interval spanning more than maxBinsPerInterval fails fast") {
    // r3 is 20 units wide: 201 bins at width 0.1 — over a cap of 100
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p", ranges, "lo", "hi", 0.1,
        maxBinsPerInterval = 100L).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString
    assert(chain.contains("increase binWidth"), s"unexpected error: $chain")
    // same cap passes at a sane binWidth
    assert(RangeJoin.pointInInterval(points, "p", ranges, "lo", "hi", 5.0,
      maxBinsPerInterval = 100L).count() == 5)
  }
}
