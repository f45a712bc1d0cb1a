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

  /** Deterministic top-k rows per group at ANY group size: two-phase
    * rank. A single `row_number` window serializes each group through
    * ONE task — for quota sampling over a handful of coarse strata
    * (languages, domains) that is the whole corpus sorting on a few
    * cores. Phase 1 ranks within (group, hash-salt) partitions and
    * keeps k per salt — the k global minima of a group necessarily
    * survive their salt's local cut — so phase 2's real window ranks at
    * most salts·k rows per group. Output matches the single-phase rank
    * exactly; `orderCols` must be fully tie-broken for determinism.
    *
    * @param saltCols plain (hashable) expressions the salt derives
    *   from. Defaults to `orderCols`, which is only valid when those
    *   are plain ascending columns — a `col.desc` sort key is a
    *   SortOrder and cannot be hashed, so pass explicit saltCols (any
    *   deterministic per-row keys, e.g. the underlying columns) when
    *   ranking descending.
    * @return input columns + `rankName` (1..k per group)
    */
  def topKPerGroup(
      df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      k: Int, salts: Int = 64, rankName: String = "rk",
      saltCols: Seq[Column] = Nil): DataFrame = {
    require(k > 0 && salts > 0, "k and salts must be positive")
    // loud failure beats silently replacing a caller's column
    val reserved = Seq("__tkg_salt", "__tkg_r1", rankName)
    val clash = reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns collide with topKPerGroup internals/output: " +
        s"${clash.mkString(", ")} — rename them or pass a different rankName")
    import org.apache.spark.sql.expressions.Window
    val groups: Seq[Column] = groupCols.map(col)
    val saltOn = if (saltCols.nonEmpty) saltCols else orderCols
    val salted = df.withColumn("__tkg_salt",
      pmod(xxhash64(saltOn: _*), lit(salts.toLong)))
    val w1 = Window.partitionBy(groups :+ col("__tkg_salt"): _*)
      .orderBy(orderCols: _*)
    val w2 = Window.partitionBy(groups: _*).orderBy(orderCols: _*)
    salted
      .withColumn("__tkg_r1", row_number().over(w1))
      .where(col("__tkg_r1") <= k)
      .withColumn(rankName, row_number().over(w2))
      .where(col(rankName) <= k)
      .drop("__tkg_salt", "__tkg_r1")
  }

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
