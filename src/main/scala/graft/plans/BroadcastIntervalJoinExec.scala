package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Static interval-stabbing index: intervals sorted by `lo` with a max-`hi`
  * segment tree over that order. `stab(p)` enumerates every interval with
  * `lo <= p` and `hi > p` (`>=` when `hiInclusive`) in O(log m + k): the
  * sorted order bounds the candidate prefix by binary search, and subtrees
  * whose max-hi cannot clear `p` are pruned wholesale. Values are boxed and
  * compared through the type's interpreted ordering — the index lives on
  * the broadcast (small) side, so boxing cost is bounded by m, not n·m.
  */
private[plans] final class IntervalIndex(
    los: Array[Any], his: Array[Any],
    ord: Ordering[Any], hiInclusive: Boolean) {
  private val n = los.length
  // interval ids in ascending-lo order; seg(node) = max hi over its span
  private val byLo: Array[Int] = Array.range(0, n).sortWith((a, b) =>
    ord.lt(los(a), los(b)))
  private val seg = new Array[Any](math.max(4 * n, 1))

  private def build(node: Int, l: Int, r: Int): Unit =
    if (r - l == 1) seg(node) = his(byLo(l))
    else {
      val mid = (l + r) >>> 1
      build(2 * node, l, mid); build(2 * node + 1, mid, r)
      seg(node) =
        if (ord.gteq(seg(2 * node), seg(2 * node + 1))) seg(2 * node)
        else seg(2 * node + 1)
    }
  if (n > 0) build(1, 0, n)

  private def clears(hi: Any, p: Any): Boolean =
    if (hiInclusive) ord.gteq(hi, p) else ord.gt(hi, p)

  /** First position in byLo order whose lo exceeds p (candidate prefix). */
  private def upperBound(p: Any): Int = {
    var l = 0; var r = n
    while (l < r) {
      val mid = (l + r) >>> 1
      if (ord.lteq(los(byLo(mid)), p)) l = mid + 1 else r = mid
    }
    l
  }

  /** Appends matching interval ids to `out` (caller clears between rows). */
  def stab(p: Any, out: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
    val ub = upperBound(p)
    if (ub > 0) descend(1, 0, n, ub, p, out)
  }

  private def descend(node: Int, l: Int, r: Int, ub: Int, p: Any,
      out: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
    if (l >= ub || !clears(seg(node), p)) return
    if (r - l == 1) { out += byLo(l); return }
    val mid = (l + r) >>> 1
    descend(2 * node, l, mid, ub, p, out)
    descend(2 * node + 1, mid, r, ub, p, out)
  }
}

/** Broadcast interval (point-in-range) join — the physical operator behind
  * [[IntervalJoinStrategy]]. For `points JOIN intervals ON p >= lo AND
  * p < hi` Spark's built-in planning has no equi key and falls back to
  * BroadcastNestedLoopJoin: every point probes every interval, O(n·m)
  * comparisons. This node broadcasts the interval side once (the same
  * `BroadcastDistribution(IdentityBroadcastMode)` contract the built-in
  * BNLJ uses, so EnsureRequirements inserts the exchange), builds one
  * [[IntervalIndex]] per task from the broadcast rows (O(m log m), m =
  * interval count), and streams the point side through it at
  * O(log m + matches) per row — the output-sensitive bound. The streamed
  * side's partitioning is preserved: no shuffle is introduced on the big
  * side, exactly the property that matters at 100 TB.
  *
  * Compare [[graft.operators.RangeJoin]]: the composed bin-bucketed form
  * is the LARGE×LARGE plan (both sides shuffle on manufactured bin keys);
  * this node is the LARGE×SMALL plan (index replaces bins, zero shuffle).
  * The strategy only fires when the interval side fits the broadcast
  * threshold, so each shape gets the plan that survives scale-up.
  */
case class BroadcastIntervalJoinExec(
    left: SparkPlan, right: SparkPlan,
    point: Expression, lo: Expression, hi: Expression,
    hiInclusive: Boolean, buildRight: Boolean) extends BinaryExecNode {

  private def streamedPlan: SparkPlan = if (buildRight) left else right
  private def buildPlan: SparkPlan = if (buildRight) right else left

  override def output = left.output ++ right.output
  override def outputPartitioning: Partitioning =
    streamedPlan.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] = {
    val bcast = BroadcastDistribution(IdentityBroadcastMode)
    if (buildRight) Seq(UnspecifiedDistribution, bcast)
    else Seq(bcast, UnspecifiedDistribution)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val broadcastRows = buildPlan.executeBroadcast[Array[InternalRow]]()
    val boundP = BindReferences.bindReference(point, streamedPlan.output)
    val boundLo = BindReferences.bindReference(lo, buildPlan.output)
    val boundHi = BindReferences.bindReference(hi, buildPlan.output)
    val ord = TypeUtils.getInterpretedOrdering(point.dataType)
      .asInstanceOf[Ordering[Any]]
    val incl = hiInclusive
    val br = buildRight
    val outAttrs = output // local copy: the closure must not capture `this`
    streamedPlan.execute().mapPartitions { iter =>
      val rows = broadcastRows.value
      // SQL comparison semantics: a null bound can never satisfy
      // lo <= p < hi, so null-bounded intervals drop out of the index
      val keep = rows.indices.filter { i =>
        boundLo.eval(rows(i)) != null && boundHi.eval(rows(i)) != null
      }.toArray
      val index = new IntervalIndex(
        keep.map(i => boundLo.eval(rows(i))),
        keep.map(i => boundHi.eval(rows(i))), ord, incl)
      val joined = new JoinedRow
      // downstream exchanges/collects cast emitted rows to UnsafeRow —
      // every physical operator must project before handing rows off
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val hits = new scala.collection.mutable.ArrayBuffer[Int]
      iter.flatMap { srow =>
        val p = boundP.eval(srow)
        if (p == null) Iterator.empty
        else {
          hits.clear()
          index.stab(p, hits)
          // JoinedRow + hits buffer + projection output are reused
          // row-to-row — safe because flatMap drains each inner iterator
          // before the next srow, the same reuse contract as the
          // built-in broadcast joins
          hits.iterator.map { k =>
            val b = rows(keep(k))
            toUnsafe(if (br) joined(srow, b) else joined(b, srow))
          }
        }
      }
    }
  }
}
