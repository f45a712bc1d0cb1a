package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def points = (1L to 400L).map(i => (i, rnd.nextDouble() * 100))
    .toDF("pid", "p")
  private def intervals = (1L to 120L).map { i =>
    val lo = rnd.nextDouble() * 100
    (i, lo, lo + rnd.nextDouble() * 10)
  }.toDF("iid", "lo", "hi")

  // AdaptiveSparkPlanExec is a LEAF node (the real plan hides behind it),
  // so tree traversal can't find the join — its string rendering can
  private def usesNative(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("BroadcastIntervalJoin")

  private def collectPairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").as[(Long, Long)].collect().toSet

  test("declarative interval join plans as BroadcastIntervalJoinExec " +
      "and matches the brute-force result") {
    val p = points.cache(); val iv = intervals.cache()
    val native = p.join(iv, col("p") >= col("lo") && col("p") < col("hi"))
    assert(usesNative(native))
    val brute = p.collect().flatMap { pr =>
      iv.collect().collect {
        case ir if pr.getDouble(1) >= ir.getDouble(1) &&
          pr.getDouble(1) < ir.getDouble(2) =>
          (pr.getLong(0), ir.getLong(0))
      }
    }.toSet
    assert(collectPairs(native) == brute && brute.nonEmpty)
  }

  test("operand order, side assignment, and <= upper bound all match") {
    val p = points; val iv = intervals
    val variants = Seq(
      p.join(iv, col("lo") <= col("p") && col("hi") > col("p")),
      iv.join(p, col("p") >= col("lo") && col("p") < col("hi")),
      p.join(iv, col("p") >= col("lo") && col("p") <= col("hi")))
    variants.foreach(v => assert(usesNative(v), v.queryExecution.toString))
    // inclusive-vs-exclusive: the <= variant must be a superset containing
    // any boundary hits, and equal when no point sits exactly on a hi
    val excl = collectPairs(variants.head)
    val incl = collectPairs(variants(2))
    assert(excl.subsetOf(incl))
    // side-swapped join output carries the same pairs
    assert(collectPairs(variants(1)) == excl)
  }

  test("extra conjuncts peel into a filter; the interval join stays native") {
    val p = points.cache(); val iv = intervals.cache()
    val base = p.join(iv, col("p") >= col("lo") && col("p") < col("hi"))
    val extra = p.join(iv,
      col("p") >= col("lo") && col("p") < col("hi") && col("pid") =!= col("iid"))
    assert(usesNative(extra), extra.queryExecution.toString)
    // the peeled predicate is applied: result = base minus pid==iid pairs
    val expect = collectPairs(base).filter { case (a, b) => a != b }
    assert(collectPairs(extra) == expect && expect.nonEmpty)
    // conjunct order must not matter (pair found among any positions)
    val reordered = p.join(iv,
      col("pid") =!= col("iid") && col("p") >= col("lo") && col("p") < col("hi"))
    assert(usesNative(reordered))
    assert(collectPairs(reordered) == expect)
  }

  test("non-matching shapes fall back to built-in planning, same result") {
    val p = points; val iv = intervals
    // strict lower bound: not recognized
    val strict = p.join(iv, col("p") > col("lo") && col("p") < col("hi"))
    assert(!usesNative(strict))
  }

  test("oversized build side with NO binWidth conf derives the width " +
      "from a sampled interval-length median — no nested loop") {
    val p = points.cache(); val iv = intervals.cache()
    def q() = p.join(iv, col("p") >= col("lo") && col("p") < col("hi"))
    val expect = collectPairs(q()) // broadcast plan, verified elsewhere
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val auto = q()
      val rendered = auto.queryExecution.executedPlan.toString
      assert(!rendered.contains("BroadcastNestedLoopJoin"), rendered)
      assert(!rendered.contains("BroadcastIntervalJoin"), rendered)
      assert(collectPairs(auto) == expect && expect.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("oversized build side with binWidth set plans the bin equi-join, " +
      "not a nested loop, and matches the broadcast result") {
    val p = points.cache(); val iv = intervals.cache()
    def q() = p.join(iv, col("p") >= col("lo") && col("p") < col("hi"))
    val expect = collectPairs(q()) // broadcast plan, already verified above
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.graft.intervalJoin.binWidth", "5.0")
      val binned = q()
      val rendered = binned.queryExecution.executedPlan.toString
      assert(!rendered.contains("BroadcastNestedLoopJoin"), rendered)
      assert(!rendered.contains("BroadcastIntervalJoin"), rendered)
      assert(collectPairs(binned) == expect && expect.nonEmpty)
      // extra conjuncts ride the same rewrite
      val extra = p.join(iv, col("p") >= col("lo") && col("p") < col("hi")
        && col("pid") =!= col("iid"))
      val renderedX = extra.queryExecution.executedPlan.toString
      assert(!renderedX.contains("BroadcastNestedLoopJoin"), renderedX)
      assert(collectPairs(extra) ==
        expect.filter { case (a, b) => a != b })
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.conf.unset("spark.graft.intervalJoin.binWidth")
    }
  }

  test("join output survives collect, exchange, and sort without a " +
      "projection in between (UnsafeRow contract)") {
    val p = points; val iv = intervals
    val j = p.join(iv, col("p") >= col("lo") && col("p") < col("hi"))
    assert(usesNative(j))
    // each of these consumes the join's rows directly: a raw collect
    // (getByteArrayRdd casts to UnsafeRow), a shuffle exchange, a sort
    assert(j.collect().nonEmpty)
    assert(j.repartition(3).count() > 0)
    assert(j.orderBy(col("pid"), col("iid")).limit(5).collect().length == 5)
  }

  test("join participates in whole-stage codegen (no silent fallback)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      // a Janino failure must surface as an error here, not a quiet
      // interpreted fallback
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val j = points.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
      assert(j.collect().nonEmpty)
      assert(j.queryExecution.executedPlan.toString
        .matches("(?s).*\\*\\(\\d+\\) BroadcastIntervalJoin.*"),
        "join not inside a WholeStageCodegen span")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("interpreted doExecute path matches codegen output " +
      "(wholeStage disabled)") {
    val p = points.cache(); val iv = intervals.cache()
    def run(): Set[(Long, Long)] = collectPairs(
      p.join(iv, col("p") >= col("lo") && col("p") < col("hi")))
    val withCodegen = run()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val interpreted = try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      run()
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    assert(interpreted == withCodegen && interpreted.nonEmpty)
  }

  test("null points and null bounds never match") {
    val p = Seq((1L, Some(5.0)), (2L, None)).toDF("pid", "p")
    val iv = Seq((1L, Some(0.0), Some(10.0)), (2L, None, Some(10.0)),
      (3L, Some(0.0), None)).toDF("iid", "lo", "hi")
    val out = p.join(iv, col("p") >= col("lo") && col("p") < col("hi"))
    assert(usesNative(out))
    assert(collectPairs(out) == Set((1L, 1L)))
  }

  test("oversized build with TIMESTAMP bounds bins on epoch micros — " +
      "no nested loop, conf set or unset") {
    def ts(m: Long) = new java.sql.Timestamp(1672531200000L + m * 60000L)
    val tp = (1L to 300L).map(i => (i, ts(rnd.nextInt(10000).toLong)))
      .toDF("pid", "p").cache()
    val tiv = (1L to 80L).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i, ts(lo), ts(lo + 1 + rnd.nextInt(120).toLong))
    }.toDF("iid", "lo", "hi").cache()
    def q() = tp.join(tiv, col("p") >= col("lo") && col("p") < col("hi"))
    val expect = collectPairs(q()) // broadcast interval plan
    assert(expect.nonEmpty)
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // explicit width: one hour of MICROSECONDS
      spark.conf.set("spark.graft.intervalJoin.binWidth", s"${3600L * 1000000}")
      val binned = q()
      val rendered = binned.queryExecution.executedPlan.toString
      assert(!rendered.contains("BroadcastNestedLoopJoin"), rendered)
      assert(collectPairs(binned) == expect)
      // unset width: sampled-median auto-width, still no nested loop
      spark.conf.unset("spark.graft.intervalJoin.binWidth")
      val auto = q()
      val renderedA = auto.queryExecution.executedPlan.toString
      assert(!renderedA.contains("BroadcastNestedLoopJoin"), renderedA)
      assert(collectPairs(auto) == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.conf.unset("spark.graft.intervalJoin.binWidth")
    }
  }

  test("grossly inverted intervals produce zero bins, not a huge " +
      "descending sequence") {
    val p = Seq((1L, 5.0), (2L, 42.0)).toDF("pid", "p")
    val iv = Seq((1L, 1.0e12, 0.0), (2L, 40.0, 45.0)).toDF("iid", "lo", "hi")
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.graft.intervalJoin.binWidth", "5.0")
      val out = p.join(iv, col("p") >= col("lo") && col("p") < col("hi"))
      // the inverted interval is empty under the join condition; the
      // valid one still matches — and no task tries to allocate 2e11 bins
      assert(collectPairs(out) == Set((2L, 2L)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.conf.unset("spark.graft.intervalJoin.binWidth")
    }
  }

  test("bin rewrite fails fast when an interval spans too many bins") {
    val p = Seq((1L, 5.0)).toDF("pid", "p")
    val iv = Seq((1L, 0.0, 1.0e9)).toDF("iid", "lo", "hi") // 2e8 bins at w=5
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.graft.intervalJoin.binWidth", "5.0")
      val e = intercept[Exception] {
        p.join(iv, col("p") >= col("lo") && col("p") < col("hi")).collect()
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("spans more than"), s"unexpected error: $e")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.conf.unset("spark.graft.intervalJoin.binWidth")
    }
  }

  test("timestamp and string point types plan natively and match " +
      "(non-numeric ordering paths)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // timestamps: internally long micros (primitive ordering)
    val tp = Seq((1L, ts("2023-01-01 10:30:00")), (2L, ts("2023-01-01 11:30:00")),
      (3L, ts("2023-01-02 00:00:00"))).toDF("pid", "p")
    val tiv = Seq(
      (10L, ts("2023-01-01 10:00:00"), ts("2023-01-01 11:00:00")),
      (20L, ts("2023-01-01 11:00:00"), ts("2023-01-02 00:00:00"))).toDF("iid", "lo", "hi")
    val tj = tp.join(tiv, col("p") >= col("lo") && col("p") < col("hi"))
    assert(usesNative(tj), tj.queryExecution.toString)
    assert(collectPairs(tj) == Set((1L, 10L), (2L, 20L)))
    // strings: genuinely interpreted (non-primitive) ordering in the index
    val sp = Seq((1L, "banana"), (2L, "cherry"), (3L, "apple")).toDF("pid", "p")
    val siv = Seq((10L, "a", "b"), (20L, "b", "c"), (30L, "cherry", "cherry"))
      .toDF("iid", "lo", "hi")
    val sj = sp.join(siv, col("p") >= col("lo") && col("p") < col("hi"))
    assert(usesNative(sj), sj.queryExecution.toString)
    // "apple" in [a,b); "banana" in [b,c); zero-width [cherry,cherry) empty
    assert(collectPairs(sj) == Set((3L, 10L), (1L, 20L)))
  }

  test("interval index stabs exactly the covering intervals") {
    val los = Array[Any](0.0, 2.0, 4.0, 4.0, 9.0)
    val his = Array[Any](3.0, 2.5, 8.0, 5.0, 9.5)
    val ord = implicitly[Ordering[Double]].asInstanceOf[Ordering[Any]]
    val idx = new IntervalIndex(los, his, ord, hiInclusive = false)
    val buf = new IntVec
    def stab(p: Double): Set[Int] = {
      buf.clear(); idx.stab(p, buf)
      (0 until buf.size()).map(buf.get).toSet
    }
    assert(stab(2.2) == Set(0, 1))
    assert(stab(4.5) == Set(2, 3))
    assert(stab(8.5) == Set.empty)
    assert(stab(9.0) == Set(4))
    assert(stab(3.0) == Set.empty[Int]) // i0's hi=3.0 is exclusive
  }
}
