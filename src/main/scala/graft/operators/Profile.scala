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

  /** Key-skew audit — the operational probe behind every shuffle-
    * planning decision in this repo (salting, AQE skew joins, g×g
    * bucket decomposition): how concentrated is a prospective
    * join/groupBy key? Output is ONE row: `n_rows`, `n_keys`,
    * `max_key_rows`, `mean_key_rows` (rounded 4), `skew_ratio` =
    * max/mean (rounded 4 — AQE's skewedPartitionFactor speaks this
    * unit), `top1_share` and `top10_share` of all rows held by the
    * heaviest 1/10 keys (rounded 6). A `skew_ratio` in the tens says
    * "salt this key or let AQE split it"; `top10_share` near 1 says
    * the key is effectively a broadcast dimension.
    *
    * Scale shape: one key-keyed hash aggregate (map-side combined)
    * collapses the table to |keys| counts; the top-10 head is a
    * TakeOrdered (distributed top-k, never a global sort), and the
    * final fold is a scalar aggregate crossed with the 1-row head
    * summary.
    */
  def keySkew(df: DataFrame, key: String): DataFrame = {
    val counts = df.groupBy(col(key).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val head = counts
      .orderBy(col("__c").desc, col("__k").asc)
      .limit(10)
      .agg(max(col("__c")).as("__top1"), sum(col("__c")).as("__top10"))
    val totals = counts.agg(
      sum(col("__c")).as("n_rows"), count(lit(1)).as("n_keys"),
      max(col("__c")).as("max_key_rows"))
    totals.crossJoin(broadcast(head))
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        round(col("n_rows") / col("n_keys"), 4).as("mean_key_rows"),
        // double first: long*long would hit ANSI overflow on a
        // billions-of-keys table
        round(col("max_key_rows").cast("double") * col("n_keys") /
          col("n_rows"), 4).as("skew_ratio"),
        round(col("__top1") / col("n_rows"), 6).as("top1_share"),
        round(col("__top10") / col("n_rows"), 6).as("top10_share"))
  }
}
