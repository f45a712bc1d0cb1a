package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile bucketing — the length-curriculum assigner of a training
  * pipeline ("short / medium / long / very-long" mixes, sequence-length
  * batching, difficulty ramps).
  */
object Buckets {

  /** Assign every row to one of `k` quantile buckets of `valueCol`:
    * bucket i covers (q_i, q_{i+1}]. ONE exact percentile aggregate
    * produces the k−1 thresholds — a driver-sized model broadcast into
    * a pure when-chain projection, so assignment adds NO second shuffle
    * and is deterministic on every retry (no sampling, no RNG). At
    * 100 TB swap `percentile` for `approx_percentile` (t-digest,
    * mergeable partials) — same plan shape, same projection. Null
    * values keep a null bucket.
    */
  def quantileBuckets(
      df: DataFrame, valueCol: String, k: Int,
      bucketName: String = "bucket"): DataFrame = {
    require(k >= 2, s"need k >= 2 buckets, got $k")
    val qs = (1 until k).map(i => i.toDouble / k)
    val row = df.agg(
      expr(s"percentile($valueCol, array(${qs.mkString(",")}))")).head()
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
}
