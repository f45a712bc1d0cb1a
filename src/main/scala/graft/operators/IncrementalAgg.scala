package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ParquetDataset

/** Incremental aggregate maintenance: keep a grouped aggregate table
  * current by merging pre-aggregated DELTAS instead of recomputing over
  * the full history — at 100 TB the history scan is the cost, and a
  * day's delta is a rounding error next to it. The exact-count sibling
  * of the HLL sketch rollup (a14): counts and sums are re-mergeable by
  * addition, so the maintained table equals the full recompute exactly.
  *
  * Mechanics: the delta (already aggregated by `keyCols`) challenges
  * only its own keys — current rows for those keys are read
  * partition-pruned, combined additively, and land via the keyed upsert
  * ([[ParquetDataset.upsert]]), so untouched partitions keep their
  * files byte-identical.
  *
  * NOT idempotent by construction: merging the same delta twice
  * double-counts. The caller owns exactly-once delta production — pair
  * with [[graft.streaming.Bookmark]] (process each file once) or a
  * streaming checkpoint, which is exactly the reference's job-bookmark
  * discipline for its incremental runs.
  *
  * Contract: `partitionCols` ⊆ `keyCols` (partition value must be a
  * pure function of the key so a key never changes partitions).
  */
object IncrementalAgg {

  /** Merge `delta` — pre-aggregated rows `(keyCols..., sumCols...)` —
    * into the aggregate table at `path`, adding sum columns per key.
    */
  def mergeAdditive(
      spark: SparkSession, path: String, delta: DataFrame,
      keyCols: Seq[String], sumCols: Seq[String],
      partitionCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty && sumCols.nonEmpty, "keys and sums required")
    require(partitionCols.forall(keyCols.contains),
      "partitionCols must be a subset of keyCols")
    require(delta.columns.toSet == (keyCols ++ sumCols).toSet,
      s"delta columns ${delta.columns.mkString(",")} must be exactly keys+sums")
    val ordered = (keyCols ++ sumCols).map(col)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || fs.listStatus(p).isEmpty) {
      delta.select(ordered: _*).write
        .partitionBy(partitionCols: _*).parquet(path)
    } else {
      val current = spark.read.parquet(path)
        .select(ordered: _*)
        .join(broadcast(delta.select(keyCols.map(col): _*).distinct()),
          keyCols, "left_semi")
      val combined = current.unionByName(delta.select(ordered: _*))
        .groupBy(keyCols.map(col): _*)
        .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
        .toDF(keyCols ++ sumCols: _*)
      ParquetDataset.upsert(spark, path, combined, keyCols, partitionCols)
    }
  }

  // -------------------------------------------------------------------
  // General monoid state (count / sum / min / max): the NON-additive
  // measures. mergeAdditive covers what `+` can re-merge; min/max need
  // their own combine, and mean must be DERIVED at read time (a stored
  // average cannot merge) — the classic partial-aggregate discipline.
  // -------------------------------------------------------------------

  private val Measures = Seq("cnt", "vsum", "vmin", "vmax")

  /** One batch → its per-key partial state `(keys..., cnt, vsum, vmin,
    * vmax)`. Map-side combined; output is key-cardinality-sized.
    */
  def partials(batch: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("vsum"),
        min(col(valueCol)).as("vmin"), max(col(valueCol)).as("vmax"))

  /** Fold a batch's partials into existing state: union + re-aggregate,
    * each measure by its own monoid combine — one keyed shuffle sized
    * by `state + delta`, nothing rescans history (and with state and
    * deltas bucketed on the keys, not even that exchanges). New keys
    * appear; absent keys carry forward untouched. Same exactly-once
    * caveat as [[mergeAdditive]].
    */
  def merge(state: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("vsum")).as("vsum"),
        min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))

  /** State → the user-facing view: derived measures (mean) computed at
    * read time from the monoid fields, floats rounded 4 (cross-engine
    * parity convention).
    */
  def finalizeState(state: DataFrame): DataFrame =
    state.select(
      state.columns.filterNot(Measures.contains).map(col) ++ Seq(
        col("cnt"),
        round(col("vsum"), 4).as("vsum"),
        col("vmin"), col("vmax"),
        round(col("vsum") / col("cnt"), 4).as("vavg")): _*)
}
