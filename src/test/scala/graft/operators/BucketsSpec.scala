package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketsSpec extends SparkSpec {
  import spark.implicits._

  test("quantileBuckets: quartiles of 1..8 split evenly, boundaries " +
      "land left (v <= q rule)") {
    val df = (1 to 8).map(i => (i.toLong, i)).toDF("id", "v")
    val out = Buckets.quantileBuckets(df, "v", k = 4)
      .orderBy("id").select("bucket").as[Int].collect().toSeq
    // quantile_cont thresholds of 1..8 at .25/.5/.75 = 2.75, 4.5, 6.25
    assert(out == Seq(0, 0, 1, 1, 2, 2, 3, 3))
  }

  test("quantileBuckets: nulls keep a null bucket; empty input yields " +
      "all-null buckets without failing") {
    val df = Seq((1L, Some(10)), (2L, None), (3L, Some(20)))
      .toDF("id", "v")
    val out = Buckets.quantileBuckets(df, "v", k = 2)
      .orderBy("id").select("bucket").as[Option[Int]].collect().toSeq
    assert(out(1).isEmpty && out(0).nonEmpty && out(2).nonEmpty)
    val empty = Buckets.quantileBuckets(
      Seq.empty[(Long, Int)].toDF("id", "v"), "v", k = 4)
    assert(empty.columns.contains("bucket") && empty.count() == 0)
  }

  test("winsorize clips into the per-group [lo, hi] percentile envelope " +
      "and leaves interior values untouched") {
    // group a: 1..10 → p10 = 1.9, p90 = 9.1 (quantile_cont interpolation)
    val df = ((1 to 10).map(i => ("a", i.toLong, i.toDouble)) ++
      Seq(("b", 100L, 5.0), ("b", 101L, 500.0))).toDF("g", "id", "v")
    val out = Buckets.winsorize(df, Seq("g"), "v", 0.1, 0.9)
      .orderBy("id").select("v_w").as[Double].collect().toSeq
    assert(math.abs(out.head - 1.9) < 1e-9)  // 1 clipped up to p10
    assert(out(4) == 5.0)                    // interior value exact
    assert(math.abs(out(9) - 9.1) < 1e-9)    // 10 clipped down to p90
    // group b's envelope comes from b alone, not the global distribution
    assert(out(10) > 5.0 && out(11) < 500.0)
  }

  test("winsorize: nulls stay null, all-null groups pass through, " +
      "and a custom output name is honored") {
    val df = Seq(("a", 1L, Some(1.0)), ("a", 2L, Some(2.0)),
      ("a", 3L, None), ("n", 4L, None))
      .toDF("g", "id", "v")
    val out = Buckets.winsorize(df, Seq("g"), "v", 0.05, 0.95, "clipped")
      .orderBy("id").select("clipped").as[Option[Double]].collect().toSeq
    assert(out(0).nonEmpty && out(1).nonEmpty)
    assert(out(2).isEmpty && out(3).isEmpty)
    intercept[IllegalArgumentException] {
      Buckets.winsorize(df, Seq("g"), "v", 0.9, 0.1)
    }
  }

  test("approx mode (exact = false): bucket assignment agrees with exact " +
      "within rank n/accuracy — and exact mode is byte-identical to the " +
      "pre-option behavior") {
    val df = (1 to 5000).map(i => (i.toLong, (i * 2641 % 5003).toDouble))
      .toDF("id", "v")
    val ex = Buckets.quantileBuckets(df, "v", k = 10)
      .orderBy("id").select("bucket").as[Int].collect().toSeq
    // exact default unchanged: same call with explicit exact = true
    val ex2 = Buckets.quantileBuckets(df, "v", k = 10, exact = true)
      .orderBy("id").select("bucket").as[Int].collect().toSeq
    assert(ex == ex2)
    // approx at accuracy >= n: thresholds are true elements within one
    // rank of the interpolated exact ones — only boundary-adjacent rows
    // may move, and only to a neighboring bucket
    val ap = Buckets.quantileBuckets(df, "v", k = 10, exact = false,
      accuracy = 10000).orderBy("id").select("bucket").as[Int].collect().toSeq
    val moved = ex.zip(ap).count { case (a, b) => a != b }
    assert(moved <= ex.size / 100, s"$moved of ${ex.size} rows moved buckets")
    assert(ex.zip(ap).forall { case (a, b) => math.abs(a - b) <= 1 },
      "approx moved a row farther than a neighboring bucket")
  }

  test("approx winsorize: clip envelope within one element of exact; " +
      "null/output-name semantics identical across modes") {
    val df = (1 to 2000).map(i => ("g", i.toLong, (i * 769 % 2003).toDouble))
      .toDF("g", "id", "v")
    val ex = Buckets.winsorize(df, Seq("g"), "v", 0.05, 0.95)
      .orderBy("id").select("v_w").as[Double].collect().toSeq
    val ap = Buckets.winsorize(df, Seq("g"), "v", 0.05, 0.95,
      exact = false, accuracy = 10000)
      .orderBy("id").select("v_w").as[Double].collect().toSeq
    // values are consecutive-ish ints mod p: one rank = distance ~1;
    // interpolation adds < 1, so envelopes differ by < 2 per side
    ex.zip(ap).foreach { case (a, b) =>
      assert(math.abs(a - b) < 2.0, s"approx clip drifted: $a vs $b") }
    // interior values untouched in both modes
    assert(ex.zip(ap).count { case (a, b) => a != b } <= (0.11 * ex.size).toInt)
  }

  test("quantileBuckets is deterministic and every bucket id is in range") {
    val df = (1 to 100).map(i => (i.toLong, i * 37 % 101)).toDF("id", "v")
    val a = Buckets.quantileBuckets(df, "v", k = 5).orderBy("id")
      .select("bucket").as[Int].collect().toSeq
    val b = Buckets.quantileBuckets(df, "v", k = 5).orderBy("id")
      .select("bucket").as[Int].collect().toSeq
    assert(a == b)
    assert(a.forall(x => x >= 0 && x < 5))
    // quartile-ish balance: exact percentiles put ~n/k per bucket
    val sizes = a.groupBy(identity).view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 2)
  }
}
