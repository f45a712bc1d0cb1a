package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  PredicateHelper, RowOrdering}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** Planner strategy recognizing the declarative point-in-interval join —
  * `points.join(intervals, p >= lo && p < hi)` in any operand order /
  * side assignment, `<=` upper bound included — and planning it as
  * [[BroadcastIntervalJoinExec]] when the interval side fits the
  * broadcast threshold. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]), the public Catalyst extension point, so
  * user code keeps the declarative form and still escapes the O(n·m)
  * BroadcastNestedLoopJoin that built-in planning produces for non-equi
  * conditions. Anything that doesn't match EXACTLY (extra conjuncts,
  * outer joins, both bounds on one side, non-orderable key types,
  * oversized build side) returns Nil and falls through to Spark's own
  * strategies — the strategy can only ever substitute a better plan for
  * the same semantics, never change them.
  */
class IntervalJoinStrategy extends SparkStrategy with PredicateHelper {

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

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, Inner, Some(cond), _) if cond.deterministic =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      val conjuncts = splitConjunctivePredicates(cond)
      if (threshold <= 0 || conjuncts.length != 2) return Nil
      val Seq(c1, c2) = conjuncts

      def attempt(lowerC: Expression, upperC: Expression): Option[SparkPlan] =
        for {
          (p1, lo) <- asLower(lowerC)
          (p2, hi, incl) <- asUpper(upperC)
          if p1.semanticEquals(p2) && RowOrdering.isOrderable(p1.dataType)
          // the point must come whole from one side, both bounds from the
          // other; sizing gates the bound (build) side to broadcast scale
          buildRight <- {
            def from(e: Expression, side: LogicalPlan) =
              e.references.nonEmpty && e.references.subsetOf(side.outputSet)
            if (from(p1, l) && from(lo, r) && from(hi, r) &&
              r.stats.sizeInBytes <= threshold) Some(true)
            else if (from(p1, r) && from(lo, l) && from(hi, l) &&
              l.stats.sizeInBytes <= threshold) Some(false)
            else None
          }
        } yield BroadcastIntervalJoinExec(
          planLater(l), planLater(r), p1, lo, hi, incl, buildRight)

      attempt(c1, c2).orElse(attempt(c2, c1)).toSeq
    case _ => Nil
  }
}
