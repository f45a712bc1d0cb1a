package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without the nested-loop product. For a
  * raw inequality predicate Spark plans BroadcastNestedLoopJoin — every
  * point against every interval, O(n·m) — because there is no equi key.
  * Binning manufactures one: intervals are exploded to the fixed-width
  * bins they cover, each point carries its single bin
  * (`floor(p / binWidth)`), and the join becomes a hash equi-join on bin
  * followed by the exact bound filter.
  *
  * A (point, interval) pair can only meet in the point's bin, so the
  * output needs no deduplication. Cost: |points| + Σ(interval width /
  * binWidth) rows through one shuffle — linear at any cardinality as
  * long as `binWidth` is on the order of the typical interval length
  * (too small explodes intervals into many bins; too large piles
  * non-matching pairs into the filter).
  */
object RangeJoin {

  /** @param maxBinsPerInterval fail-fast cap on the explode fanout: one
    *   interval spanning `> maxBinsPerInterval` bins means `binWidth` is
    *   mis-sized for the data (each such row would allocate that many
    *   array entries before OOM/array-limit errors surface far from the
    *   cause). Checked per row inside the plan; raising it is legitimate
    *   for genuinely wide intervals.
    */
  def pointInInterval(
      points: DataFrame, pCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val shared = points.columns.toSet.intersect(ranges.columns.toSet)
    require(shared.isEmpty,
      s"points and ranges share column names: ${shared.mkString(", ")} — " +
        "rename one side before joining")
    val pb = points.withColumn("__bin",
      floor(col(pCol) / binWidth).cast("long"))
    val binLo = floor(col(loCol) / binWidth).cast("long")
    val binHi = floor(col(hiCol) / binWidth).cast("long")
    // assert_true yields NULL on pass; adding it (coalesced to 0) into the
    // sequence start makes the check un-prunable — a mis-sized binWidth
    // fails with this message instead of an opaque array-size error
    // NULL bounds keep their pre-guard behavior (sequence(NULL, …) is
    // NULL, explode drops the row) — the assert must not fire on them
    val guard = coalesce(
      assert_true(
        binLo.isNull || binHi.isNull || binHi - binLo < lit(maxBinsPerInterval),
        concat(lit(s"range join: an interval spans more than " +
          s"$maxBinsPerInterval bins of width $binWidth ([")
          , col(loCol), lit(", "), col(hiCol),
          lit(")) — increase binWidth or maxBinsPerInterval"))).cast("long"),
      lit(0L))
    // inverted intervals (lo > hi) are EMPTY under the bound filter and
    // must produce zero bins — a descending sequence would manufacture
    // |span| candidates, and a grossly inverted interval would explode
    // into a huge array before the guard (which tests the ascending
    // span) could fire
    val bins = when(binLo > binHi, array().cast("array<long>"))
      .otherwise(sequence(binLo + guard, binHi))
    val rb = ranges.withColumn("__bin", explode(bins))
    pb.join(rb, Seq("__bin"))
      .where(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__bin")
  }

  /** LEFT-OUTER point-in-interval join: every point survives, nulls on
    * the range side where no interval covers it — the enrichment shape
    * ("attach the containing session, keep unmatched events"). Composed
    * as the inner bin join plus an anti-join of the unmatched points
    * against the MATCHED point set, so both legs stay linear and keyed;
    * no nested loop at any cardinality.
    *
    * The anti-join compares every point column NULL-SAFELY (`<=>`): with
    * plain equality a matched row holding a NULL attribute would never
    * equal its own entry in the matched set and would be re-emitted as
    * "unmatched" with nulled range columns — appearing both matched and
    * null-extended. EqualNullSafe still extracts as a hash-join key, so
    * the leg stays a keyed anti join, not a nested loop.
    */
  def pointInIntervalLeft(
      points: DataFrame, pCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, maxBinsPerInterval: Long = 100000L): DataFrame = {
    val inner = pointInInterval(
      points, pCol, ranges, loCol, hiCol, binWidth, maxBinsPerInterval)
    // prefixed aliases break the self-join lineage so each <=> side
    // resolves unambiguously
    val matched = inner.select(points.columns.map(col): _*).distinct()
      .toDF(points.columns.map("__m_" + _): _*)
    val antiCond = points.columns
      .map(c => col(c) <=> col("__m_" + c)).reduce(_ && _)
    val unmatched = points.join(matched, antiCond, "left_anti")
    val nulls = ranges.schema.fields.toSeq.map(f =>
      lit(null).cast(f.dataType).as(f.name))
    inner.unionByName(unmatched.select(points.columns.map(col) ++ nulls: _*))
  }

  /** INTERVAL-OVERLAP join: pairs (a, b) with `a.lo < b.hi && b.lo <
    * a.hi` (half-open overlap) — both sides are ranges, the
    * generalization of [[pointInInterval]]. A raw inequality-only
    * predicate plans a nested loop; here BOTH sides explode to their
    * covered bins and hash-join on bin.
    *
    * A pair shares every bin its overlap spans, so naive bin-join output
    * needs dedup — an extra shuffle sized by the (replicated) result.
    * Instead each pair is ATTRIBUTED to exactly one bin: the bin of the
    * overlap's start, `floor(max(a.lo, b.lo) / w)`. Both intervals
    * cover that point, so both carry the bin; every other shared bin is
    * filtered by the attribution predicate at the join — zero
    * duplicates, no dedup pass, output exactly the overlap relation.
    *
    * Cost: Σ(width / binWidth) exploded rows per side through one
    * shuffle; binWidth should be on the order of the typical interval
    * length on the SHORTER-interval side.
    */
  def intervalOverlap(
      left: DataFrame, lo1: String, hi1: String,
      right: DataFrame, lo2: String, hi2: String,
      binWidth: Double, maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"left and right share column names: ${shared.mkString(", ")} — " +
        "rename one side before joining")
    def binned(df: DataFrame, loCol: String, hiCol: String): DataFrame = {
      val binLo = floor(col(loCol) / binWidth).cast("long")
      val binHi = floor(col(hiCol) / binWidth).cast("long")
      val guard = coalesce(
        assert_true(
          binLo.isNull || binHi.isNull ||
            binHi - binLo < lit(maxBinsPerInterval),
          concat(lit(s"interval-overlap join: an interval spans more " +
            s"than $maxBinsPerInterval bins of width $binWidth (["),
            col(loCol), lit(", "), col(hiCol),
            lit(")) — increase binWidth or maxBinsPerInterval")))
          .cast("long"),
        lit(0L))
      // inverted (lo > hi) intervals are empty: zero bins, like
      // pointInInterval
      val bins = when(binLo > binHi, array().cast("array<long>"))
        .otherwise(sequence(binLo + guard, binHi))
      df.withColumn("__bin", explode(bins))
    }
    val lb = binned(left, lo1, hi1)
    val rb = binned(right, lo2, hi2)
    val overlapStartBin =
      floor(greatest(col(lo1), col(lo2)) / binWidth).cast("long")
    lb.join(rb, Seq("__bin"))
      .where(col(lo1) < col(hi2) && col(lo2) < col(hi1) &&
        col("__bin") === overlapStartBin)
      .drop("__bin")
  }

  /** Rows sampled (leading partitions — a cost heuristic) for the
    * automatic bin width.
    */
  val AutoWidthSampleSize = 10000

  /** Median of the positive FINITE lengths in `lens` — the one
    * auto-width rule, shared with the planner strategy
    * ([[graft.plans.IntervalJoinStrategy]]) so the two paths can never
    * drift. Infinite lengths (open-ended intervals) are excluded: an
    * infinite width would collapse every row into one bin — the exact
    * single-task pathology binning exists to avoid. Mutates `lens`
    * order (sorts in place).
    */
  private[graft] def medianPositive(lens: Array[Double]): Option[Double] = {
    val ok = lens.filter(d => d > 0 && !d.isNaN && !d.isInfinite)
    if (ok.isEmpty) None
    else {
      java.util.Arrays.sort(ok)
      Some(ok(ok.length / 2))
    }
  }

  /** [[pointInInterval]] with the bin width derived from the sampled
    * median interval length — the same auto-width contract as the
    * declarative [[graft.plans.IntervalJoinStrategy]]. Width only tunes
    * cost, never correctness, so a biased sample degrades performance,
    * not results. Fails fast when the sample holds no positive finite
    * length (pass an explicit width for such data).
    */
  def pointInInterval(
      points: DataFrame, pCol: String,
      ranges: DataFrame, loCol: String, hiCol: String): DataFrame = {
    val lens = ranges
      .select((col(hiCol) - col(loCol)).cast("double").as("len"))
      .limit(AutoWidthSampleSize)
      .collect().map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    val width = medianPositive(lens).getOrElse(throw new IllegalArgumentException(
      "cannot derive binWidth: no positive finite interval length in the " +
        "sample — pass binWidth explicitly"))
    pointInInterval(points, pCol, ranges, loCol, hiCol, width)
  }
}
