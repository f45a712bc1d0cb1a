package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile bucketing — the length-curriculum assigner of a training
  * pipeline ("short / medium / long / very-long" mixes, sequence-length
  * batching, difficulty ramps).
  */
object Buckets {

  /** Percentile aggregate SQL, exact or approximate. Exact `percentile`
    * keeps a full value multiset per partial — fine to ~10⁸ rows per
    * executor; at 100 TB the state is the problem, and
    * `approx_percentile` (mergeable GK sketch, rank error ≤ n/accuracy)
    * is the same plan shape with O(accuracy) state. The approx result
    * carries the INPUT column type (it returns an actual element, not an
    * interpolation), so it is cast back to percentile's double to keep
    * downstream schemas identical across modes.
    */
  private[operators] def pctSql(
      valueCol: String, qs: String, exact: Boolean, accuracy: Int): String =
    if (exact) s"percentile($valueCol, $qs)"
    else {
      val cast = if (qs.startsWith("array(")) "array<double>" else "double"
      s"cast(approx_percentile($valueCol, $qs, $accuracy) as $cast)"
    }

  /** Assign every row to one of `k` quantile buckets of `valueCol`:
    * bucket i covers (q_i, q_{i+1}]. ONE percentile aggregate produces
    * the k−1 thresholds — a driver-sized model broadcast into a pure
    * when-chain projection, so assignment adds NO second shuffle and is
    * deterministic on every retry (no sampling, no RNG). `exact = false`
    * swaps in `approx_percentile` at `accuracy` (see [[pctSql]]) — the
    * 100 TB option: same plan, sketch-sized aggregation state, bucket
    * boundaries within rank n/accuracy of exact. Null values keep a
    * null bucket.
    */
  def quantileBuckets(
      df: DataFrame, valueCol: String, k: Int,
      bucketName: String = "bucket",
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(k >= 2, s"need k >= 2 buckets, got $k")
    val qs = (1 until k).map(i => i.toDouble / k)
    val row = df.agg(expr(
      pctSql(valueCol, s"array(${qs.mkString(",")})", exact, accuracy))).head()
    if (row.isNullAt(0)) // empty input: no thresholds, all-null buckets
      return df.withColumn(bucketName, lit(null).cast("int"))
    val thresholds = row.getSeq[Double](0)
    val v = col(valueCol)
    val chain = thresholds.zipWithIndex.foldRight(lit(k - 1): Column) {
      case ((t, i), acc) => when(v <= t, lit(i)).otherwise(acc)
    }
    df.withColumn(bucketName,
      when(v.isNull, lit(null)).otherwise(chain).cast("int"))
  }

  /** Per-group winsorization: clip `valueCol` into its group's
    * [lo, hi] percentile envelope — outlier taming before
    * normalization / feature extraction. The bounds table is
    * group-sized (a MODEL: one row per group) and broadcast back; the
    * data pays one aggregation and one narrow clip projection, never a
    * sort. Null values stay null (least/greatest would silently swallow
    * them — they skip nulls); all-null groups pass through unclipped.
    * `exact = false` swaps in `approx_percentile` at `accuracy` (see
    * [[pctSql]]) — per-group sketch state instead of per-group value
    * multisets.
    */
  def winsorize(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, outName: String = "",
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(lo >= 0 && lo < hi && hi <= 1, s"need 0 <= lo < hi <= 1")
    require(groupCols.nonEmpty, "groupCols required (use a lit group for global)")
    val out = if (outName.isEmpty) s"${valueCol}_w" else outName
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(expr(pctSql(valueCol, lo.toString, exact, accuracy)).as("__w_lo"),
        expr(pctSql(valueCol, hi.toString, exact, accuracy)).as("__w_hi"))
    val v = col(valueCol)
    df.join(broadcast(bounds), groupCols)
      .withColumn(out, when(v.isNull, lit(null))
        .otherwise(least(greatest(v, col("__w_lo")), col("__w_hi"))))
      .drop("__w_lo", "__w_hi")
  }
}
