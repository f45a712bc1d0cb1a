package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the most recent right
  * row at or before the left row's time, within the same key partition —
  * the "latest preceding quote for this trade" / "attributed click for
  * this error" shape. Spark has no native as-of join; the common
  * workarounds (range-condition join → O(n·m) per key, or per-row probe
  * joins) don't scale.
  *
  * This implementation is the sort-merge form: union both inputs, one
  * shuffle partitioned by key and sorted by (time, side), then a
  * last-non-null carry-forward window. Cost is one exchange + one sort of
  * |left| + |right| rows — the same plan Spark would produce for a single
  * window aggregation, with no pair blowup at any key cardinality or time
  * skew. Right rows sort before left rows at equal timestamps, so a
  * same-instant right row matches (`<=` semantics).
  *
  * Rows with multiple right rows at the SAME (key, time) are ambiguous by
  * definition — pre-aggregate the right side (e.g. keep max id) to make
  * the result deterministic; [[graft.SparkEntry]]'s `j6_asof_join` shows
  * the pattern.
  *
  * @param keyCols  equality keys; must exist on both sides by name
  * @param payload  right-side column → output name, carried to each
  *                 matched left row (null where no right row precedes)
  * @param tolerance optional max staleness as an interval string (e.g.
  *                 "1 HOUR"): a preceding right row older than this is
  *                 treated as no match (payload nulls) — the "quote too
  *                 stale to attribute" contract. The match itself stays
  *                 the latest-preceding row; tolerance only gates it.
  */
object AsofJoin {

  def asof(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      payload: Map[String, String],
      tolerance: Option[String] = None): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    require(!payload.contains("__rt"), "__rt is a reserved payload name")
    require(keyCols.forall(right.columns.contains),
      s"right side must carry the key columns ${keyCols.mkString(", ")}")
    val reserved = Seq("__t", "__side", "__p", "__m")
    require(!left.columns.exists(reserved.contains),
      s"left side uses reserved column names (${reserved.mkString(", ")})")
    // output names must not shadow a left column — a duplicate name would
    // only fail on downstream access, far from this call site
    val clash = payload.values.toSeq.intersect(left.columns.toSeq)
    require(clash.isEmpty,
      s"payload output names collide with left columns: ${clash.mkString(", ")}")
    require(payload.values.toSeq.distinct.size == payload.size,
      "payload output names must be distinct")
    // key dtypes must match exactly: a silent cast would turn a type
    // mismatch into all-null join keys (zero matches) instead of an error
    keyCols.foreach { k =>
      val (lt, rt) = (left.schema(k).dataType, right.schema(k).dataType)
      require(lt == rt,
        s"key column $k has mismatched types: left=$lt right=$rt — " +
          "cast one side explicitly before joining")
    }
    // the matched right row's own time rides in the carry struct so the
    // tolerance gate can compare it against the left time after the fact
    val pStruct = struct(
      col(rightTime).cast("timestamp").as("__rt") +:
        payload.keys.toSeq.map(col): _*)
    val lFields = left.schema.fields.toSeq
    // right rows reshaped to the left schema (non-key columns nulled) so
    // the union lines up by name
    val r2 = right.select(
      lFields.map(f =>
        if (keyCols.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)) ++
        Seq(col(rightTime).cast("timestamp").as("__t"),
          lit(0).as("__side"), pStruct.as("__p")): _*)
    val l2 = left.select(
      lFields.map(f => col(f.name)) ++
        Seq(col(leftTime).cast("timestamp").as("__t"),
          lit(1).as("__side"),
          lit(null).cast(r2.schema("__p").dataType).as("__p")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fresh = tolerance match {
      case None => lit(true)
      case Some(t) =>
        col("__m").getField("__rt") >= col("__t") - expr(s"INTERVAL $t")
    }
    l2.unionByName(r2)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(lFields.map(f => col(f.name)) ++
        payload.map { case (rc, out) =>
          when(fresh, col("__m").getField(rc)).as(out) }: _*)
  }
}
