package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic bootstrap — error bars for corpus metrics. A single
  * mean ("avg quality = 0.62") says nothing about whether a curation
  * change MOVED the metric or wobbled it; the bootstrap's replicate
  * spread does. RNG-based resampling breaks re-runs and the oracle
  * contract, so replicate membership is an md5 coin per (row, replicate)
  * — the repo's hash-split convention (first hex digit < '8' ⇒ keep,
  * p=1/2 half-sampling) — making every replicate, and therefore the CI,
  * bit-reproducible on any cluster layout.
  *
  * Scale shape: the corpus crosses a broadcast `reps`-row frame (a
  * deliberate ×B blow-up — B is a small constant, the per-replicate
  * partial means combine map-side, and the quantile fold runs over B
  * scalars). For a 100 TB corpus pick B ≈ 20-50: the cost is B linear
  * passes fused into ONE shuffle of B rows.
  */
object Resample {

  /** One row: `n_reps`, `mean` (grand mean of replicate means),
    * `ci_lo` / `ci_hi` (5th / 95th percentile of replicate means,
    * linear interpolation — the `percentile`/`quantile_cont`
    * convention), all rounded 6.
    */
  def bootstrapCI(df: DataFrame, id: String, value: String,
      reps: Int = 40): DataFrame = {
    require(reps >= 2, s"need at least 2 replicates, got $reps")
    val repsDf = df.sparkSession.range(reps).toDF("__b")
    val means = df
      .select(col(id).cast("string").as("__id"),
        col(value).cast("double").as("__v"))
      .crossJoin(broadcast(repsDf))
      .where(substring(md5(concat_ws(":", col("__id"), col("__b"))), 1, 1)
        < "8")
      .groupBy(col("__b")).agg(avg(col("__v")).as("__m"))
    means.agg(count(lit(1)).as("n_reps"),
      round(avg(col("__m")), 6).as("mean"),
      round(expr("percentile(__m, 0.05)"), 6).as("ci_lo"),
      round(expr("percentile(__m, 0.95)"), 6).as("ci_hi"))
  }
}
