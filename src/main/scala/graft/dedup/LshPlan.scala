package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash-LSH parameter planner — the design step in front of
  * [[Dedup.minhashPairs]]: given a signature budget of `totalHashes`
  * minhash functions and a target Jaccard `threshold`, which (bands b,
  * rows r) split (b·r = budget) should the banding use? Each split's
  * collision curve is P(candidate | J=j) = 1 − (1 − j^r)^b, an S-curve
  * with midpoint t* ≈ (1/b)^(1/r); the planner scores every divisor
  * split by the curve's mass on the wrong side of the threshold:
  *
  *   fp_area = ∫_{j<t} P(j) dj     (dissimilar pairs still colliding —
  *                                  wasted verification work)
  *   fn_area = ∫_{j≥t} 1 − P(j) dj (true duplicates the banding loses —
  *                                  recall debt no verification recovers)
  *
  * both integrated on a uniform `gridStep`-point grid (the standard MMDS
  * banding analysis; the uniform-J weighting makes the areas comparable
  * across splits, not a corpus-calibrated error rate). `best` flags the
  * minimum-cost split(s). In practice a dedup pipeline weights fn_area
  * higher (lost recall is unrecoverable; false positives only cost
  * verification CPU) — the full curve is in the output, so callers can
  * re-weight without re-planning.
  *
  * Scale: the relation is #divisors(totalHashes) × gridStep cells —
  * bounded by the signature budget, never the corpus. It runs as a
  * Spark plan (sequence/explode + codegen'd pow) so the report composes
  * with the rest of a planning notebook, not because it needs a cluster.
  */
object LshPlan {

  def plan(spark: SparkSession, totalHashes: Int, threshold: Double,
      gridStep: Int = 20): DataFrame = {
    require(totalHashes >= 1, s"totalHashes must be >= 1, got $totalHashes")
    require(threshold > 0 && threshold < 1,
      s"threshold must be in (0,1), got $threshold")
    require(gridStep >= 4, s"gridStep must be >= 4, got $gridStep")
    import spark.implicits._
    val divisors = (1 to totalHashes).filter(totalHashes % _ == 0)
    val base = divisors.toDF("bands")
      .select(col("bands"), (lit(totalHashes) / col("bands"))
        .cast("int").as("rows"))
      .withColumn("j", explode(expr(s"sequence(1, ${gridStep - 1})")))
      .withColumn("jac", col("j") / lit(gridStep.toDouble))
      .withColumn("p",
        lit(1.0) - pow(lit(1.0) - pow(col("jac"), col("rows")),
          col("bands")))
    val scored = base.groupBy(col("bands"), col("rows"))
      .agg(
        round(pow(lit(1.0) / col("bands").cast("double"),
          lit(1.0) / col("rows").cast("double")), 4).as("t_star"),
        round(sum(when(col("jac") < threshold, col("p"))
          .otherwise(lit(0.0))) / gridStep, 4).as("fp_area"),
        round(sum(when(col("jac") >= threshold, lit(1.0) - col("p"))
          .otherwise(lit(0.0))) / gridStep, 4).as("fn_area"))
      .withColumn("cost", round(col("fp_area") + col("fn_area"), 4))
    val best = scored.agg(min(col("cost")).as("__min"))
    scored.crossJoin(broadcast(best))
      .select(col("bands"), col("rows"), col("t_star"), col("fp_area"),
        col("fn_area"), col("cost"), (col("cost") === col("__min"))
          .as("best"))
  }
}
