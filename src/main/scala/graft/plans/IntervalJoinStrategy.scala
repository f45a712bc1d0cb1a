package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, Alias, And, Attribute, AttributeReference, Cast, Divide, EqualTo,
  Explode, Expression, Floor, GreaterThan, GreaterThanOrEqual, If, IsNull,
  LessThan, LessThanOrEqual, Literal, Or, PredicateHelper, RaiseError,
  RowOrdering, Sequence, Subtract, UnixDate, UnixMicros}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.execution.{FilterExec, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{
  ArrayType, DateType, DoubleType, LongType, NumericType, TimestampType}
import scala.util.control.NonFatal

/** Planner strategy recognizing the declarative point-in-interval join —
  * `points.join(intervals, p >= lo && p < hi)` in any operand order /
  * side assignment, `<=` upper bound included — and planning the fast
  * form instead of the O(n·m) BroadcastNestedLoopJoin that built-in
  * planning produces for non-equi conditions. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]), the public Catalyst extension point.
  *
  * Shape tolerance: the interval pair may sit among ADDITIONAL conjuncts
  * (`… && pid != iid`); the extras are peeled into a filter above the
  * interval join, so adding a predicate never silently demotes the plan
  * to a nested loop.
  *
  * Physical choice:
  *  - bound (build) side within the broadcast threshold →
  *    [[BroadcastIntervalJoinExec]]: broadcast max-hi segment list,
  *    O(log m + k) per probe row, zero shuffle of the point side.
  *  - oversized build side with numeric, timestamp, or date bounds →
  *    the large×large path: the join is REWRITTEN to the bin-bucketed
  *    logical form ([[graft.operators.RangeJoin]]'s plan — explode
  *    intervals to covered fixed-width bins, equi-join on the point's
  *    bin, re-filter exact bounds) and handed back to the planner, which
  *    gives it a shuffled hash/sort-merge join. Linear in both inputs;
  *    no broadcast, no nested loop. Timestamps bin on epoch
  *    microseconds, dates on epoch days (the exact original condition is
  *    the re-filter, so the cast only manufactures candidates). Width
  *    comes from `spark.graft.intervalJoin.binWidth` when set — a
  *    logical strategy sees byte statistics, not value distributions —
  *    and otherwise from a sampled interval-length median
  *    ([[autoWidth]]); width should be on the order of the typical
  *    interval length (see RangeJoin's sizing notes).
  *  - otherwise → Nil, falling through to Spark's own strategies: the
  *    strategy only ever substitutes a better plan for the same
  *    semantics, never changes them.
  */
class IntervalJoinStrategy(
    owner: Option[org.apache.spark.sql.SparkSession] = None)
  extends SparkStrategy with PredicateHelper {

  def this() = this(None)

  /** Session conf for the large×large bin width (same unit as the point
    * column; for timestamp bounds the unit is MICROSECONDS, for date
    * bounds days). Unset = the width is derived automatically from a
    * sampled interval-length median ([[autoWidth]]); set it to pin the
    * width when the sample would be unrepresentative.
    */
  val BinWidthConf = "spark.graft.intervalJoin.binWidth"

  /** Rows sampled (from the leading partitions — a cost heuristic, not a
    * statistic) when deriving the automatic bin width.
    */
  val AutoWidthSampleSize = 10000

  /** Fail-fast cap on explode fanout, mirroring
    * [[graft.operators.RangeJoin]]'s default: beyond this many bins per
    * interval the configured width is mis-sized for the data.
    */
  val MaxBinsPerInterval = 100000L

  /** (point, bound) when e is `point >= bound` in either written order. */
  private def asLower(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case LessThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }

  /** (point, bound, inclusive) when e is `point < bound` / `point <= bound`. */
  private def asUpper(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case LessThan(a, b) => Some((a, b, false))
      case LessThanOrEqual(a, b) => Some((a, b, true))
      case GreaterThan(a, b) => Some((b, a, false))
      case GreaterThanOrEqual(a, b) => Some((b, a, true))
      case _ => None
    }

  /** A recognized interval pair among the join's conjuncts: the point
    * comes whole from one side, both bounds from the other, `rest` is
    * every conjunct not consumed by the pair.
    */
  private case class IntervalShape(
      point: Expression, lo: Expression, hi: Expression, hiInclusive: Boolean,
      buildRight: Boolean, rest: Seq[Expression])

  private def findShape(
      conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Option[IntervalShape] = {
    def from(e: Expression, side: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)
    val candidates = for {
      i <- conjuncts.indices.iterator
      j <- conjuncts.indices.iterator
      if i != j
      (p1, lo) <- asLower(conjuncts(i)).iterator
      (p2, hi, incl) <- asUpper(conjuncts(j)).iterator
      if p1.semanticEquals(p2) && RowOrdering.isOrderable(p1.dataType)
      buildRight <-
        (if (from(p1, l) && from(lo, r) && from(hi, r)) Some(true)
         else if (from(p1, r) && from(lo, l) && from(hi, l)) Some(false)
         else None).iterator
    } yield IntervalShape(p1, lo, hi, incl, buildRight,
      conjuncts.zipWithIndex.collect { case (c, k) if k != i && k != j => c })
    candidates.nextOption()
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, Inner, Some(cond), _) if cond.deterministic =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.length < 2) return Nil
      findShape(conjuncts, l, r) match {
        case None => Nil
        case Some(shape) =>
          val threshold = SQLConf.get.autoBroadcastJoinThreshold
          val buildSide = if (shape.buildRight) r else l
          if (threshold > 0 && buildSide.stats.sizeInBytes <= threshold) {
            val exec = BroadcastIntervalJoinExec(
              planLater(l), planLater(r), shape.point, shape.lo, shape.hi,
              shape.hiInclusive, shape.buildRight)
            Seq(
              if (shape.rest.isEmpty) exec
              else FilterExec(shape.rest.reduce(And), exec))
          } else binRewrite(plan, l, r, shape, cond).toSeq
      }
    case _ => Nil
  }

  /** Large×large fallback: rebuild the join as the bin-bucketed logical
    * plan and hand it back to the planner (`planLater`). Bins only
    * manufacture an equi key — the full original condition is re-applied
    * above the join, so any bin width is correct; width only tunes cost.
    * A point meets an interval in exactly one bin (the point's), so no
    * dedup is needed. Null points/bounds produce null bins or an empty
    * bin sequence and drop, matching inner-join null semantics.
    */
  /** Maps a point/bound expression onto the numeric line the bins live
    * on: numerics pass through, timestamps become epoch MICROSECONDS
    * (`unix_micros` — exact, monotonic, ANSI-safe), dates become epoch
    * days. None for any other type.
    */
  private def epochOf(e: Expression): Option[Expression] = e.dataType match {
    case _: NumericType => Some(e)
    case TimestampType => Some(UnixMicros(e))
    case DateType => Some(Cast(UnixDate(e), LongType))
    case _ => None
  }

  /** Automatic bin width: median interval length over a bounded sample
    * of the intervals side, executed as its own tiny subquery
    * (`take` reads only the leading partitions — a deliberately cheap
    * cost heuristic; the width only tunes candidate fanout, never
    * correctness). Note the tradeoff this buys: the sampling job runs
    * at PLAN time, so even `explain()` of an oversized interval join
    * reads up to the sample's rows — accepted, because the alternative
    * is the nested-loop plan. The median rule itself is shared with the
    * explicit API ([[graft.operators.RangeJoin.medianPositive]]) so the
    * two paths cannot drift. None when the sample yields no positive
    * finite length OR the sampling fails — the failure is logged before
    * falling through to built-in planning, so a silent BNLJ degrade is
    * traceable.
    *
    * The sampled width is CACHED per canonicalized intervals plan: the
    * planner re-plans (and `explain()` replans) the same query several
    * times, and without the cache each pass re-runs the sampling job.
    * The cache is per-strategy-instance — strategies are built once per
    * session by [[graft.GraftExtensions]] — so entries never leak across
    * sessions. Bounded LRU (`AutoWidthCacheSize`) so long-lived sessions
    * planning many distinct interval joins don't accumulate plans.
    */
  private val AutoWidthCacheSize = 64

  private val widthCache =
    new java.util.LinkedHashMap[LogicalPlan, Option[Double]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[LogicalPlan, Option[Double]]): Boolean =
        size() > AutoWidthCacheSize
    }

  /** The session owning the plan being sampled: the one this strategy
    * was registered with when available (multi-session applications —
    * `SparkSession.active` can be a DIFFERENT session with different
    * conf/catalog than the one planning), else the active session.
    */
  private def sessionFor(): org.apache.spark.sql.classic.SparkSession =
    owner match {
      case Some(s: org.apache.spark.sql.classic.SparkSession) => s
      case _ => org.apache.spark.sql.classic.SparkSession.active
    }

  private def autoWidth(
      intervals: LogicalPlan, epochLo: Expression,
      epochHi: Expression): Option[Double] =
    if (intervals.isStreaming) None
    else {
      val proj = Project(Seq(
        Alias(Cast(epochLo, DoubleType), "__graft_lo")(),
        Alias(Cast(epochHi, DoubleType), "__graft_hi")()), intervals)
      val key = proj.canonicalized
      widthCache.synchronized {
        val hit = widthCache.get(key)
        if (hit != null) return hit
      }
      val computed = try {
        val rows = sessionFor().sessionState
          .executePlan(proj).toRdd.take(AutoWidthSampleSize)
        val lens = rows.iterator
          .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
          .map(r => r.getDouble(1) - r.getDouble(0)).toArray
        graft.operators.RangeJoin.medianPositive(lens)
      } catch {
        case NonFatal(e) =>
          logWarning("interval-join auto-width sampling failed; falling " +
            s"through to built-in planning (likely BroadcastNestedLoopJoin). " +
            s"Set $BinWidthConf explicitly. Cause: $e")
          None
      }
      widthCache.synchronized { widthCache.put(key, computed) }
      computed
    }

  private def binRewrite(
      join: LogicalPlan, l: LogicalPlan, r: LogicalPlan,
      shape: IntervalShape, cond: Expression): Option[SparkPlan] = {
    val epochs = Seq(shape.point, shape.lo, shape.hi).map(epochOf)
    if (epochs.exists(_.isEmpty)) return None
    val Seq(epochP, epochLo, epochHi) = epochs.flatten
    val (points, intervals) = if (shape.buildRight) (l, r) else (r, l)
    val widthStr = SQLConf.get.getConfString(BinWidthConf, "")
    val width =
      if (widthStr.isEmpty) autoWidth(intervals, epochLo, epochHi) match {
        case Some(w) => w
        case None => return None
      }
      else
        try {
          val w = widthStr.toDouble
          require(w > 0, s"$BinWidthConf must be positive, got $widthStr")
          w
        } catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$BinWidthConf must be a positive number, got '$widthStr'")
        }

    def bin(e: Expression): Expression =
      Cast(Floor(Divide(Cast(e, DoubleType), Literal(width))), LongType)

    // the point's single bin rides a projection; fresh exprIds keep the
    // helper column from ever colliding with user attributes
    val pBinAlias = Alias(bin(epochP), "__graft_bin")()
    val pointsB = Project(points.output :+ pBinAlias, points)
    // each interval explodes to the bins it covers. Inverted intervals
    // (lo > hi) are EMPTY under the join condition and must produce zero
    // bins — a descending Sequence would instead manufacture |span|
    // candidates and a grossly inverted interval would explode into a
    // huge array. Same fail-fast fanout guard as
    // RangeJoin.pointInInterval: one interval spanning more than
    // MaxBinsPerInterval bins means the width is mis-sized for the data,
    // and must surface as THIS message, not an opaque array-allocation
    // error (or a quiet OOM) deep in a task
    val binLo = bin(epochLo)
    val binHi = bin(epochHi)
    val guard = If(
      Or(Or(IsNull(binLo), IsNull(binHi)),
        LessThan(Subtract(binHi, binLo), Literal(MaxBinsPerInterval))),
      Literal(0L),
      Cast(new RaiseError(Literal(
        s"interval join bin rewrite: an interval spans more than " +
          s"$MaxBinsPerInterval bins of width $width — increase " +
          s"$BinWidthConf")), LongType))
    val emptyBins =
      Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false))
    val binsExpr = If(GreaterThan(binLo, binHi), emptyBins,
      Sequence(Add(binLo, guard), binHi, None, None))
    val iBinAttr =
      AttributeReference("__graft_bin", LongType, nullable = false)()
    val intervalsB = Generate(
      Explode(binsExpr),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(iBinAttr), child = intervals)
    val binJoin = Join(pointsB, intervalsB, Inner,
      Some(EqualTo(pBinAlias.toAttribute, iBinAttr)), JoinHint.NONE)
    val filtered = Filter(cond, binJoin)
    val out: Seq[Attribute] = join.output
    Some(planLater(Project(out, filtered)))
  }
}
