package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  BindReferences, BoundReference, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}

/** Growable int list with a Java-friendly surface (the generated code
  * calls it directly — Scala collection methods have mangled names).
  */
private[plans] final class IntVec {
  private var arr = new Array[Int](16)
  private var n = 0
  def add(i: Int): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
    arr(n) = i; n += 1
  }
  def get(k: Int): Int = arr(k)
  def size(): Int = n
  def clear(): Unit = n = 0
}

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
  def stab(p: Any, out: IntVec): Unit = {
    val ub = upperBound(p)
    if (ub > 0) descend(1, 0, n, ub, p, out)
  }

  private def descend(node: Int, l: Int, r: Int, ub: Int, p: Any,
      out: IntVec): Unit = {
    if (l >= ub || !clears(seg(node), p)) return
    if (r - l == 1) { out.add(byLo(l)); return }
    val mid = (l + r) >>> 1
    descend(2 * node, l, mid, ub, p, out)
    descend(2 * node + 1, mid, r, ub, p, out)
  }
}

/** Per-task probe facade over the broadcast interval rows: builds the
  * index once, then `stab(p)` fills an internal hit list that generated
  * code walks with `size()`/`row(k)` — plain-Java calls, no generics.
  * One instance per task (built in generated-class init / per partition),
  * so the internal buffer needs no synchronization.
  */
final class IntervalProbe(
    rows: Array[InternalRow], keep: Array[Int],
    index: IntervalIndex, hits: IntVec) {
  def stab(p: Any): Unit = { hits.clear(); if (p != null) index.stab(p, hits) }
  def size(): Int = hits.size()
  def row(k: Int): InternalRow = rows(keep(hits.get(k)))
}

/** Serializable recipe for [[IntervalProbe]]: ships the broadcast handle
  * plus bound bound-expressions; `build()` evaluates lo/hi over the
  * broadcast rows on the executor and assembles the index. Null-bounded
  * intervals are excluded (SQL comparison semantics).
  */
final class IntervalProbeBuilder(
    bcast: org.apache.spark.broadcast.Broadcast[Array[InternalRow]],
    boundLo: Expression, boundHi: Expression,
    pointType: org.apache.spark.sql.types.DataType,
    hiInclusive: Boolean) extends Serializable {
  def build(): IntervalProbe = {
    val rows = bcast.value
    val ord = TypeUtils.getInterpretedOrdering(pointType)
      .asInstanceOf[Ordering[Any]]
    // evaluate each bound once per row, then filter the value arrays
    val los = rows.map(boundLo.eval)
    val his = rows.map(boundHi.eval)
    val keep = rows.indices.filter(i => los(i) != null && his(i) != null)
      .toArray
    val index = new IntervalIndex(
      keep.map(los), keep.map(his), ord, hiInclusive)
    new IntervalProbe(rows, keep, index, new IntVec)
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
    hiInclusive: Boolean, buildRight: Boolean)
  extends BinaryExecNode with CodegenSupport {

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

  private def probeBuilder(): IntervalProbeBuilder =
    new IntervalProbeBuilder(
      buildPlan.executeBroadcast[Array[InternalRow]](),
      BindReferences.bindReference(lo, buildPlan.output),
      BindReferences.bindReference(hi, buildPlan.output),
      point.dataType, hiInclusive)

  override protected def doExecute(): RDD[InternalRow] = {
    val builder = probeBuilder()
    val boundP = BindReferences.bindReference(point, streamedPlan.output)
    val br = buildRight
    val outAttrs = output // local copy: the closure must not capture `this`
    streamedPlan.execute().mapPartitions { iter =>
      val probe = builder.build()
      val joined = new JoinedRow
      // downstream exchanges/collects cast emitted rows to UnsafeRow —
      // every physical operator must project before handing rows off
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { srow =>
        probe.stab(boundP.eval(srow))
        // JoinedRow + probe hit list + projection output are reused
        // row-to-row — safe because flatMap drains each inner iterator
        // before the next srow, the same reuse contract as the built-in
        // broadcast joins
        (0 until probe.size()).iterator.map { k =>
          val b = probe.row(k)
          toUnsafe(if (br) joined(srow, b) else joined(b, srow))
        }
      }
    }
  }

  // ---- whole-stage codegen ------------------------------------------
  // The streamed side stays inside the surrounding WholeStageCodegen
  // span; per row the generated code evaluates the point, probes the
  // per-task interval index, and walks the hit list emitting joined
  // column variables — no iterator allocation, no row materialization
  // until the next exchange.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    streamedPlan.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String =
    streamedPlan.asInstanceOf[CodegenSupport].produce(ctx, this)

  // every matched interval emits a row that shares the streamed row's
  // column variables — downstream buffering operators must copy
  override def needCopyResult: Boolean = true

  override def doConsume(
      ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String = {
    val builderTerm = ctx.addReferenceObj("probeBuilder", probeBuilder(),
      classOf[IntervalProbeBuilder].getName)
    val probeTerm = ctx.addMutableState(classOf[IntervalProbe].getName,
      "intervalProbe", v => s"$v = $builderTerm.build();")
    // evaluate the point from the streamed row's column variables
    ctx.currentVars = input
    val pEv = BindReferences.bindReference(point, streamedPlan.output)
      .genCode(ctx)
    val pBoxed = CodeGenerator.javaType(point.dataType) match {
      case jt if CodeGenerator.isPrimitiveType(jt) =>
        s"${CodeGenerator.boxedType(point.dataType)}.valueOf(${pEv.value})"
      case _ => s"(Object) ${pEv.value}"
    }
    // build-side columns read from the matched broadcast row
    val buildRow = ctx.freshName("buildRow")
    ctx.currentVars = null
    ctx.INPUT_ROW = buildRow
    val buildVars = buildPlan.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val outVars =
      if (buildRight) input ++ buildVars else buildVars ++ input
    val k = ctx.freshName("k")
    // buildVars' code is NOT pre-emitted here: consume() evaluates each
    // variable exactly once at the consumption site (inside the loop,
    // where $buildRow is in scope) — emitting it here too would redefine
    // the locals and fail Janino compilation
    s"""
       |${pEv.code}
       |$probeTerm.stab(${pEv.isNull} ? null : $pBoxed);
       |int ${k}n = $probeTerm.size();
       |for (int $k = 0; $k < ${k}n; $k++) {
       |  InternalRow $buildRow = $probeTerm.row($k);
       |  ${consume(ctx, outVars)}
       |}
     """.stripMargin
  }
}
