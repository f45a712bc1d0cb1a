package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots — the
  * data-quality gate a production pipeline runs on every refresh
  * (feature drift before retraining, ingest anomaly detection before
  * publishing). The standard measure is the Population Stability
  * Index: bucket the REFERENCE distribution into quantile bins, score
  * the CURRENT snapshot's mass shift per bin,
  * `psi = Σ (p_i − q_i) · ln(p_i / q_i)`.
  *
  * The bin thresholds are a driver-sized model (k−1 doubles from one
  * percentile aggregate over the reference — the [[Buckets]] pattern);
  * each snapshot then pays one narrow bucket projection and one
  * k-row count aggregate. Nothing driver-side scales with the data.
  */
object Drift {

  /** Per-bucket PSI decomposition of `valueCol` between `ref` and
    * `cur`: (bucket, n_ref, n_cur, psi_term), bucket 0..k−1 by the
    * reference's k-quantile bins. Empty-bucket proportions clamp to
    * `eps` (PSI is undefined at zero mass; 1e-6 is the conventional
    * floor). `psi_term` rounds to 9 decimals so independent engines
    * agree to the hash; total PSI = sum(psi_term).
    */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      k: Int = 10, eps: Double = 1e-6,
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(k >= 2, s"need k >= 2 buckets, got $k")
    val qs = (1 until k).map(i => i.toDouble / k)
    val row = ref.agg(expr(Buckets.pctSql(
      valueCol, s"array(${qs.mkString(",")})", exact, accuracy))).head()
    require(!row.isNullAt(0), "reference snapshot has no non-null values")
    val thresholds = row.getSeq[Double](0)
    def bucketOf(v: Column): Column =
      thresholds.zipWithIndex.foldRight(lit(k - 1): Column) {
        case ((t, i), acc) => when(v <= t, lit(i)).otherwise(acc)
      }.cast("int")
    def counted(df: DataFrame, name: String): DataFrame = df
      .where(col(valueCol).isNotNull)
      .groupBy(bucketOf(col(valueCol)).as("bucket"))
      .agg(count(lit(1)).as(name))
    // localCheckpoint the k-row join result (k ≤ bucket count — trivial
    // to materialize) so BOTH consumers below read the k rows instead of
    // re-evaluating the two counted() subplans — each a full snapshot
    // scan + shuffle — a second time; exchange reuse would usually
    // de-duplicate them, but that's an optimizer courtesy, not a
    // guarantee
    val joined = counted(ref, "n_ref")
      .join(counted(cur, "n_cur"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .localCheckpoint()
    // totals come from a k-row aggregate broadcast back onto the k-row
    // result — no second pass over the data, and no single-partition
    // window exchange in the plan (the checkpointed k rows aggregate in
    // one partial)
    val totals = joined.agg(
      sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"))
    val p = greatest(col("n_ref").cast("double") / col("__tr"), lit(eps))
    val q = greatest(col("n_cur").cast("double") / col("__tc"), lit(eps))
    joined.crossJoin(broadcast(totals))
      .withColumn("psi_term", round((p - q) * log(p / q), 9))
      .drop("__tr", "__tc")
  }

  /** Robust per-group outlier detection by modified z-score
    * (median/MAD — immune to the outliers it hunts, unlike mean/σ):
    * z = 0.6745 · (v − median) / MAD, flag |z| > cutoff (3.5 is the
    * Iglewicz-Hoaglin convention). Two group-sized percentile
    * aggregates (median, then median absolute deviation) broadcast
    * back as models; the data pays two narrow projections. A
    * zero-MAD group (over half its mass on one value) flags any
    * deviation from the median instead of dividing by zero. Returns
    * only the flagged rows, z rounded to 4.
    */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      cutoff: Double = 3.5,
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "groupCols required")
    val v = col(valueCol)
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(expr(Buckets.pctSql(valueCol, "0.5", exact, accuracy)).as("__med"))
    val withMed = df.join(broadcast(med), groupCols)
    val mad = withMed
      .groupBy(groupCols.map(col): _*)
      .agg(expr(Buckets.pctSql(
        s"abs($valueCol - __med)", "0.5", exact, accuracy)).as("__mad"))
    withMed.join(broadcast(mad), groupCols)
      .withColumn("z", round(
        lit(0.6745) * (v - col("__med")) / col("__mad"), 4))
      .where(when(col("__mad") === 0.0, v =!= col("__med"))
        .otherwise(abs(col("z")) > cutoff))
      .drop("__med", "__mad")
  }

  /** Robust scaling — `(x − median) / IQR` per group: the
    * outlier-insensitive standardization (z-scores move with every
    * extreme value; median/IQR don't), the normalize step feature
    * pipelines run after [[madOutliers]] has flagged and
    * [[graft.operators.Buckets.winsorize]] has clipped. Same shape as
    * both: one group-sized percentile model broadcast back, one narrow
    * projection. Zero-IQR groups (constant-valued) scale to 0 rather
    * than divide by zero; output quantized 4.
    */
  def robustScale(df: DataFrame, groupCols: Seq[String],
      valueCol: String, outName: String = "scaled",
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "groupCols required")
    val v = col(valueCol)
    def p(q: String) = expr(Buckets.pctSql(valueCol, q, exact, accuracy))
    val model = df.groupBy(groupCols.map(col): _*)
      .agg(p("0.5").as("__med"), (p("0.75") - p("0.25")).as("__iqr"))
    df.join(broadcast(model), groupCols)
      .withColumn(outName,
        when(col("__iqr") === 0.0, lit(0.0))
          .otherwise(round((v - col("__med")) / col("__iqr"), 4)))
      .drop("__med", "__iqr")
  }
}
