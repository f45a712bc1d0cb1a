package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation patterns. Plain count/sum aggregates are already
  * skew-tolerant in Spark (map-side partial aggregation shrinks hot keys
  * before the shuffle); what blows up on a hot key are the aggregates
  * whose partial state is as big as the data — count-distinct,
  * collect_list/set. Salting splits that state across `salts` reducers
  * and merges the splits in a second, tiny aggregation.
  */
object Salted {

  /** Exact count-distinct per key with the value space salted: stage 1
    * counts distinct values within (key, hash(value) % salts) — each
    * distinct value lands in exactly one salt bucket, so the per-bucket
    * distinct counts add up exactly in stage 2. A hot key's state is
    * split `salts` ways instead of accumulating on one reducer.
    */
  def countDistinct(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int, resultName: String = "n_distinct"): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    df
      .groupBy(keys :+ pmod(xxhash64(col(valueCol)), lit(salts.toLong))
        .as("__salt"): _*)
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as(resultName))
  }
}
