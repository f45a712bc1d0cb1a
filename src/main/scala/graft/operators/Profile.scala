package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling for data-quality reporting — the
  * "is this table sane after conversion" check the reference's
  * validation scripts run column by column, as a single distributed
  * aggregate: per profiled column the row count, null count, exact
  * distinct count, and min/max (rendered as strings so one profile row
  * type covers every column type). All measures ride ONE aggregation
  * over one scan — profiling N columns never costs N jobs; the explode
  * to long format happens on the single result row.
  *
  * Notes: distinct counts are exact (count(DISTINCT) — Spark plans one
  * expand + aggregate; swap for approx_count_distinct when profiling
  * very-high-cardinality columns at scale), and null counts derive from
  * `total − count(col)` since count over a column skips nulls.
  * Min/max string rendering follows each engine's CAST — profile
  * integer/string columns for cross-engine-comparable output; double
  * rendering differs between engines.
  */
object Profile {

  def table(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.isEmpty) df.columns.toSeq else columns
    require(cols.nonEmpty, "nothing to profile")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(", ")}")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c"))) :+
      count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("column"),
      col("__total").as("n_rows"),
      (col("__total") - col(s"__nn_$c")).as("n_nulls"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__mn_$c").as("min_str"),
      col(s"__mx_$c").as("max_str"))): _*)
    row.select(explode(entries).as("p")).select(col("p.*"))
  }
}
