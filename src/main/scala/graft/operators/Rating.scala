package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley–Terry strength ratings from pairwise preference outcomes —
  * the aggregation a preference-data pipeline runs to turn millions of
  * (winner, loser) comparisons into per-model (or per-policy,
  * per-annotator-slot) strength scores: under the BT model
  * P(i beats j) = r_i / (r_i + r_j), and the minorization–maximization
  * update (Hunter 2004, "MM algorithms for generalized Bradley-Terry
  * models")
  *
  *   r_i ← W_i / Σ_{j≠i} n_ij / (r_i + r_j)
  *
  * monotonically increases the likelihood. A FIXED number of
  * iterations from the all-ones start keeps the computation
  * deterministic and exactly replayable in SQL (the repo's
  * trained-model convention: BPE, k-means, the LR quality model).
  *
  * Scale shape: the comparison log is corpus-sized but collapses
  * immediately to the (i, j) game matrix — one hash aggregate with
  * map-side combine — and every iteration is a pair of k-sized joins
  * against the ratings table (k = #players, model-sized, so AQE
  * broadcasts them). Nothing is collected to the driver; the corpus
  * is touched exactly once.
  */
object Rating {

  /** Ratings after `iters` MM updates. Output: (player, rating) with
    * rating rounded to 6 decimals (oracle-parity convention). Players
    * that never win rate 0 after one update — the MM fixed point for a
    * winless player — and stay there; callers wanting regularization
    * add virtual games upstream.
    */
  def bradleyTerry(pairs: DataFrame, winner: String, loser: String,
      iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // directed win counts, then the symmetric game matrix n_ij and
    // per-player win totals W_i — the only corpus-sized aggregation
    val g = pairs
      .groupBy(col(winner).as("w"), col(loser).as("l"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val nn = g.select(col("w").as("i"), col("l").as("j"), col("c").as("n"))
      .unionAll(g.select(col("l").as("i"), col("w").as("j"),
        col("c").as("n")))
      .groupBy(col("i"), col("j")).agg(sum(col("n")).as("n"))
      .localCheckpoint()
    val wi = g.groupBy(col("w").as("i")).agg(sum(col("c")).as("wtot"))
    val players = nn.select(col("i")).distinct()
    var r = players.select(col("i"), lit(1.0).as("r"))
    for (_ <- 1 to iters) {
      // r_i ← W_i / Σ_j n_ij / (r_i + r_j); the two ratings joins are
      // k-sized (players), the group-by is over the k² game matrix
      r = nn
        .join(r.select(col("i"), col("r").as("ri")), "i")
        .join(r.select(col("i").as("j"), col("r").as("rj")), "j")
        .groupBy(col("i"))
        .agg(sum(col("n") / (col("ri") + col("rj"))).as("den"))
        .join(wi, Seq("i"), "left")
        .select(col("i"),
          (coalesce(col("wtot"), lit(0L)) / col("den")).as("r"))
        .localCheckpoint()
    }
    r.select(col("i").as("player"), round(col("r"), 6).as("rating"))
  }

  /** Pairwise win-rate matrix with Wilson 95% intervals — the raw
    * head-to-head table published beside the BT leaderboard: per
    * unordered matchup (i, j), the game count, i's empirical win rate,
    * and the Wilson score interval (the binomial CI that stays sane at
    * small n and extreme rates, unlike the Wald interval every
    * spreadsheet reaches for — at n=3, p=1 Wald says [1, 1], Wilson
    * honestly says [0.44, 1]). An interval straddling 0.5 means the
    * matchup is UNRESOLVED at this sample size — the "collect more
    * comparisons here" signal an active-sampling loop feeds on.
    *
    * Scale shape: one game-matrix aggregate (shared shape with
    * [[bradleyTerry]]) then pure per-row arithmetic — no joins at all.
    */
  def winMatrix(pairs: DataFrame, winner: String, loser: String,
      z: Double = 1.96): DataFrame = {
    val g = pairs
      .groupBy(col(winner).as("w"), col(loser).as("l"))
      .agg(count(lit(1)).as("c"))
    val m = g
      .select(least(col("w"), col("l")).as("i"),
        greatest(col("w"), col("l")).as("j"),
        when(col("w") < col("l"), col("c")).otherwise(lit(0L))
          .as("wins_i"),
        col("c").as("n"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("wins_i")).as("wins_i"), sum(col("n")).as("n_games"))
    val n = col("n_games").cast("double")
    val p = col("wins_i") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (lit(4.0) * n * n)) / denom
    m.select(col("i"), col("j"), col("n_games"), col("wins_i"),
      round(p, 4).as("p_emp"),
      round(center - half, 4).as("wilson_lo"),
      round(center + half, 4).as("wilson_hi"),
      (round(center - half, 4) <= 0.5 && round(center + half, 4) >= 0.5)
        .as("unresolved"))
  }

  /** Bradley–Terry calibration — the goodness-of-fit check that makes
    * the ratings trustworthy: per UNORDERED matchup (i, j) the model
    * predicts P(i beats j) = rᵢ/(rᵢ+rⱼ); bucketing matchups by that
    * prediction and comparing the game-weighted predicted mean against
    * the empirical win fraction per bucket is the reliability diagram
    * every preference pipeline should publish next to its
    * leaderboard — systematic bucket deviation means the
    * one-dimensional strength model is wrong (intransitive matchups,
    * style effects), not just noisy. Uses the ROUNDED published
    * ratings so the diagram reproduces from the leaderboard.
    *
    * Output: (bucket, n_matchups, n_games, p_pred, p_emp) — bucket k
    * covers predictions [k/buckets, (k+1)/buckets), the top edge
    * folded into the last bucket.
    *
    * Scale shape: one game-matrix aggregate (the corpus-sized step,
    * shared shape with [[bradleyTerry]]), two k-sized rating joins
    * (AQE-broadcast), then a buckets-bounded aggregate.
    */
  def btCalibration(pairs: DataFrame, winner: String, loser: String,
      iters: Int = 2, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val ratings = bradleyTerry(pairs, winner, loser, iters)
    val g = pairs
      .groupBy(col(winner).as("w"), col(loser).as("l"))
      .agg(count(lit(1)).as("c"))
    val m = g
      .select(least(col("w"), col("l")).as("i"),
        greatest(col("w"), col("l")).as("j"),
        when(col("w") < col("l"), col("c")).otherwise(lit(0L))
          .as("wins_i"),
        col("c").as("n"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("wins_i")).as("wins_i"), sum(col("n")).as("n"))
    val scored = m
      .join(ratings.select(col("player").as("i"),
        col("rating").as("ri")), "i")
      .join(ratings.select(col("player").as("j"),
        col("rating").as("rj")), "j")
      .withColumn("p", col("ri") / (col("ri") + col("rj")))
    scored
      .withColumn("bucket",
        least(floor(col("p") * buckets), lit(buckets - 1L)).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_matchups"), sum(col("n")).as("n_games"),
        round(sum(col("p") * col("n")) / sum(col("n")), 4).as("p_pred"),
        round(sum(col("wins_i")) / sum(col("n")).cast("double"), 4)
          .as("p_emp"))
  }
}
