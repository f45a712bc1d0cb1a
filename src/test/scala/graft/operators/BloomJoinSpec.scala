package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoin equals the plain left-semi join exactly") {
    val probe = (1L to 2000L).map(i => (i, s"p$i")).toDF("k", "payload")
    val build = (1L to 2000L by 7).map(i => (i, "x")).toDF("bk", "tag")
    val expected = probe.join(build, $"k" === $"bk", "left_semi")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val got = BloomJoin.semiJoin(probe, build, Seq("k"), Seq("bk"),
        expectedItems = 300, fpp = 0.01)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("prefilter admits every true match even with a saturated tiny " +
      "bitset (false positives allowed, false negatives never)") {
    val probe = (1L to 5000L).toDF("k")
    val build = (1L to 5000L by 3).toDF("k")
    // 64-bit bitset for ~1700 keys: heavily saturated — worst case
    val bits = BloomJoin.bitset(build, Seq(col("k")), expectedItems = 1, fpp = 0.5)
    val kept = BloomJoin.prefilter(probe, Seq(col("k")), bits,
        expectedItems = 1, fpp = 0.5)
      .as[Long].collect().toSet
    val trueKeys = (1L to 5000L by 3).toSet
    assert(trueKeys.subsetOf(kept))
  }

  test("realized false-positive rate is near the requested fpp") {
    val build = (1L to 10000L).toDF("k")
    val bits = BloomJoin.bitset(build, Seq(col("k")),
      expectedItems = 10000, fpp = 0.01)
    // disjoint probe range: every admitted row is a false positive
    val probe = (100001L to 120000L).toDF("k")
    val fp = BloomJoin.prefilter(probe, Seq(col("k")), bits,
      expectedItems = 10000, fpp = 0.01).count()
    assert(fp < 20000 * 0.05, s"false-positive count $fp out of 20000")
  }

  test("multi-column keys and empty build side") {
    val probe = (1L to 100L).map(i => (i % 10, s"g${i % 7}", i))
      .toDF("a", "b", "v")
    val build = Seq((3L, "g1"), (4L, "g2")).toDF("a", "b")
    val expected = probe.join(build, Seq("a", "b"), "left_semi")
      .as[(Long, String, Long)].collect().sortBy(_._3).toSeq
    val got = BloomJoin.semiJoin(probe, build, Seq("a", "b"), Seq("a", "b"),
        expectedItems = 10)
      .as[(Long, String, Long)].collect().sortBy(_._3).toSeq
    assert(got == expected && got.nonEmpty)
    val none = BloomJoin.semiJoin(probe, build.filter(lit(false)),
      Seq("a", "b"), Seq("a", "b"), expectedItems = 10)
    assert(none.count() == 0)
  }

  test("the bloom filter sits BELOW the exact join in the plan — " +
      "literal and broadcast-udf tiers both") {
    // parquet-backed probe: over a LocalRelation the optimizer folds
    // the (foldable-input) filter away entirely, hiding the plan shape
    val tmp = graft.EntryKit.scratchTracked("bloom_plan").toString
    (1L to 500L).toDF("k").write.mode("overwrite").parquet(tmp)
    val probe = spark.read.parquet(tmp)
    val build = (1L to 500L by 11).toDF("k")
    // literal tier (small sketch)
    val small = BloomJoin.semiJoin(probe, build, Seq("k"), Seq("k"), 50)
    val planS = small.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(planS.contains(graft.functions.BloomContains.Name), planS)
    assert(!planS.contains("BroadcastNestedLoopJoin"), planS)
    // the filter must be on the probe-scan side, i.e. INSIDE the join's
    // subtree: in the formatted tree, subtree lines print after their
    // parent, so the Filter line must come after the LeftSemi line
    val tree = planS.linesIterator.takeWhile(!_.startsWith("(")).toVector
    val joinIdx = tree.indexWhere(_.contains("LeftSemi"))
    val filterIdx = tree.indexWhere(_.contains("Filter"))
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"filter not below the join:\n$planS")
    // broadcast-udf tier: force it by sizing past MaxLiteralWords
    val bigExpected = (BloomJoin.MaxLiteralWords.toLong + 1) * 64 * 2
    val bits = BloomJoin.bitset(build, Seq(col("k")), bigExpected, 0.01)
    assert(bits.length > BloomJoin.MaxLiteralWords)
    val kept = BloomJoin.prefilter(probe, Seq(col("k")), bits,
      bigExpected, 0.01).select("k").as[Long].collect().toSet
    assert((1L to 500L by 11).toSet.subsetOf(kept))
  }

  test("expression eval and codegen agree with the aggregator's " +
      "position arithmetic") {
    val probe = (1L to 500L).toDF("k")
    val build = (1L to 500L by 11).toDF("k")
    val bits = BloomJoin.bitset(build, Seq(col("k")), 50, 0.01)
    def run(cg: String): Set[Long] = {
      spark.conf.set("spark.sql.codegen.wholeStage", cg)
      try BloomJoin.prefilter(probe, Seq(col("k")), bits, 50, 0.01)
        .as[Long].collect().toSet
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(run("false") == run("true"))
  }

  test("sizing: word-aligned, capped, sane k") {
    val (m1, k1) = BloomJoin.sizing(1000, 0.01)
    assert(m1 % 64 == 0 && m1 >= 9585 && k1 >= 6 && k1 <= 8)
    val (m2, _) = BloomJoin.sizing(Long.MaxValue / 4, 0.01)
    assert(m2 == BloomJoin.MaxBits)
    val (m3, k3) = BloomJoin.sizing(1, 0.5)
    assert(m3 == 64 && k3 >= 1)
  }
}
