package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the fastText-style tier above
  * the heuristic rule battery ([[TextAnalysis.qualityRuleFlags]]):
  * hashed bag-of-words features into a logistic model trained by
  * full-batch gradient descent, the recipe behind learned quality /
  * domain gates (CCNet's fastText LM filter, the GPT-3 WebText
  * classifier, phi's quality model). Labels come from any boolean
  * column expression — a curated seed set, a heuristic silver label, a
  * domain marker.
  *
  * Scale shape: the corpus collapses ONCE into a sparse hashed profile
  * `(id, bucket, x)` (one explode + one map-side-combined aggregate,
  * localCheckpointed); every training iteration then costs two keyed
  * aggregates over that profile — margins by id, gradient by bucket —
  * and the model state is `buckets + 1` doubles on the driver
  * (broadcast back as a join table), so iterations never re-read text
  * and nothing driver-held scales with the corpus. Feature hashing is
  * the md5-low-24-bit convention shared with [[Dsir]], and every
  * floating hand-off (x, margin, sigmoid, gradient, weight) quantizes
  * to 9 decimals — the PageRank discipline that lets a SQL oracle
  * replay training bit-for-bit.
  *
  * Determinism: w₀ = 0, fixed lr, quantized arithmetic — no RNG, no
  * init sensitivity; identical model on every run/retry.
  */
object QualityModel {

  /** Sparse hashed features: (id, bucket, x = round(n_b/n_tokens, 9))
    * plus a bias row (bucket = -1, x = 1) per document. Blank documents
    * drop (`split` would otherwise hand them a single ""-token).
    */
  def hashedFeatures(docs: DataFrame, id: String, text: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val toks = docs.where(trim(col(text)) =!= "")
      .select(col(id).as("id"), TextAnalysis.tokens(col(text)).as("__ws"))
    val counts = toks
      .select(col("id"), size(col("__ws")).as("nt"),
        explode(col("__ws")).as("w"))
      .select(col("id"), col("nt"),
        pmod(conv(substring(md5(col("w")), 1, 6), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bucket"))
      .groupBy(col("id"), col("bucket"))
      .agg(round(count(lit(1)) / first(col("nt")), 9).as("x"))
    counts.unionByName(
      toks.select(col("id"), lit(-1L).as("bucket"), lit(1.0).as("x")))
  }

  /** Fit the logistic model: `iters` full-batch GD steps from w₀ = 0.
    * Returns bucket → weight (bucket -1 = bias), a `buckets + 1`-entry
    * driver map — the documented driver-state budget.
    */
  def fit(docs: DataFrame, id: String, text: String, label: Column,
      buckets: Int = 64, iters: Int = 3, lr: Double = 0.5)
      : Map[Long, Double] =
    fitFeats(hashedFeatures(docs, id, text, buckets).localCheckpoint(),
      labelsOf(docs, id, text, label), iters, lr)

  private def labelsOf(docs: DataFrame, id: String, text: String,
      label: Column): DataFrame =
    docs.where(trim(col(text)) =!= "")
      .select(col(id).as("id"), when(label, 1.0).otherwise(0.0).as("y"))
      .localCheckpoint()

  /** GD loop over a materialized profile — `trainAndScore` shares the
    * profile between training and scoring through this seam.
    */
  private def fitFeats(feats: DataFrame, labels: DataFrame, iters: Int,
      lr: Double): Map[Long, Double] = {
    require(iters >= 1, "iters must be >= 1")
    val spark = feats.sparkSession
    import spark.implicits._
    val n = labels.count()
    var w = Map.empty[Long, Double]
    for (_ <- 1 to iters) {
      val errs = marginsWith(feats, spark.createDataset(w.toSeq)
          .toDF("bucket", "w"))
        .join(labels, "id")
        .select(col("id"),
          (round(sigmoid(col("margin")), 9) - col("y")).as("err"))
      // gradient: bucket-sized (≤ buckets + 1 rows), the only collect
      val grad = feats.join(errs, "id")
        .groupBy(col("bucket"))
        .agg(round(sum(col("x") * col("err")) / lit(n.toDouble), 9).as("g"))
        .as[(Long, Double)].collect()
      w = grad.map { case (b, g) =>
        b -> BigDecimal(w.getOrElse(b, 0.0) - lr * g)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    w
  }

  /** Score documents under a fitted model: (id, prob, predicted). */
  def score(docs: DataFrame, id: String, text: String,
      model: Map[Long, Double], buckets: Int): DataFrame =
    scoreFeats(hashedFeatures(docs, id, text, buckets), model)

  private def scoreFeats(feats: DataFrame,
      model: Map[Long, Double]): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    marginsWith(feats,
        spark.createDataset(model.toSeq).toDF("bucket", "w"))
      .select(col("id"), round(sigmoid(col("margin")), 4).as("prob"))
      .withColumn("predicted", col("prob") >= 0.5)
  }

  /** Fit then score the same corpus — the silver-label bootstrap. The
    * checkpointed profile is built ONCE and shared by the GD loop and
    * the final scoring pass.
    */
  def trainAndScore(docs: DataFrame, id: String, text: String,
      label: Column, buckets: Int = 64, iters: Int = 3,
      lr: Double = 0.5): DataFrame = {
    val feats = hashedFeatures(docs, id, text, buckets).localCheckpoint()
    scoreFeats(feats,
      fitFeats(feats, labelsOf(docs, id, text, label), iters, lr))
  }

  /** Per-doc margin Σ_b x_b·w_b under a (bucket, w) model table. An
    * empty model (iteration 1) short-circuits to margin 0 — exactly
    * σ⁻¹(0.5), matching w₀ = 0.
    */
  private def marginsWith(feats: DataFrame, wDf: DataFrame): DataFrame =
    if (wDf.isEmpty)
      feats.select(col("id")).distinct()
        .withColumn("margin", lit(0.0))
    else
      feats.join(broadcast(wDf), "bucket")
        .groupBy(col("id"))
        .agg(round(sum(col("x") * col("w")), 9).as("margin"))

  private def sigmoid(m: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-m))
}
