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

  def pointInInterval(
      points: DataFrame, pCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val shared = points.columns.toSet.intersect(ranges.columns.toSet)
    require(shared.isEmpty,
      s"points and ranges share column names: ${shared.mkString(", ")} — " +
        "rename one side before joining")
    val pb = points.withColumn("__bin",
      floor(col(pCol) / binWidth).cast("long"))
    val rb = ranges.withColumn("__bin", explode(sequence(
      floor(col(loCol) / binWidth).cast("long"),
      floor(col(hiCol) / binWidth).cast("long"))))
    pb.join(rb, Seq("__bin"))
      .where(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__bin")
  }
}
