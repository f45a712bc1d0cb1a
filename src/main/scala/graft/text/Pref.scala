package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair construction for DPO/RLHF post-training corpora:
  * per prompt, a pool of scored candidate responses collapses to one
  * (chosen, rejected) pair — the highest- and lowest-scored candidates
  * — with the degenerate shapes every preference trainer must reject
  * filtered (or, in [[pairAudit]], reported) rather than silently
  * emitted: single-candidate prompts, zero-margin pools, and pairs
  * whose two texts are identical (the gradient is exactly zero and the
  * pair only burns tokens).
  *
  * Determinism: ties on score are broken by response id via a
  * lexicographic (score, resp_id) struct ordering inside `max_by` /
  * `min_by`, so re-runs (and the SQL oracle's `row_number` twin) pick
  * the same extreme rows. Shape: ONE prompt-keyed aggregation — group
  * state is two candidate structs regardless of pool size, so a
  * 100 TB response table reduces map-side and shuffles only
  * (prompt, 2 structs).
  */
object Pref {

  /** One row per surviving prompt: (prompt_id, chosen_id, rejected_id,
    * n_responses, margin). A prompt survives when it has ≥ 2
    * candidates, `margin = score(chosen) - score(rejected) >=
    * minMargin`, and the two texts differ. Margin is rounded to 4
    * decimals (the repo-wide oracle-comparison convention).
    */
  def preferencePairs(responses: DataFrame, prompt: String,
      respId: String, text: String, score: String,
      minMargin: Double): DataFrame = {
    val ord = struct(col("sc"), col("resp_id"))
    val cand = struct(col("resp_id"), col("t"), col("sc"))
    val pooled = responses
      .select(col(prompt).as("prompt_id"), col(respId).as("resp_id"),
        col(text).as("t"), col(score).cast("double").as("sc"))
      .groupBy(col("prompt_id"))
      .agg(count(lit(1)).as("n_responses"),
        max_by(cand, ord).as("ch"), min_by(cand, ord).as("rj"))
    pooled
      .where(col("n_responses") >= 2 &&
        (col("ch.sc") - col("rj.sc")) >= minMargin &&
        col("ch.t") =!= col("rj.t"))
      .select(col("prompt_id"), col("ch.resp_id").as("chosen_id"),
        col("rj.resp_id").as("rejected_id"), col("n_responses"),
        round(col("ch.sc") - col("rj.sc"), 4).as("margin"))
  }

  /** Best-of-N rejection sampling — the SFT-side twin of
    * [[preferencePairs]]: per prompt, keep only the top-scored
    * candidate (ties broken by resp_id, same lexicographic ordering),
    * reporting the pool size it won over. Feed it a trained
    * quality/reward score and this IS the rejection-sampling data
    * recipe (Llama 2's iterative SFT, WebGPT's best-of-n). Same
    * one-aggregate shape: constant state per prompt.
    */
  def bestOfN(responses: DataFrame, prompt: String, respId: String,
      score: String): DataFrame = {
    responses
      .select(col(prompt).as("prompt_id"), col(respId).as("resp_id"),
        col(score).cast("double").as("sc"))
      .groupBy(col("prompt_id"))
      .agg(max_by(struct(col("resp_id"), col("sc")),
          struct(col("sc"), col("resp_id"))).as("b"),
        count(lit(1)).as("n_responses"))
      .select(col("prompt_id"), col("b.resp_id").as("best_id"),
        col("b.sc").as("best_score"), col("n_responses"))
  }

  /** The validity gate ahead of [[preferencePairs]] — one row per
    * prompt with the defect flags preference curation reports on:
    * `too_few` (a single candidate — no pair exists), `zero_margin`
    * (every candidate scored identically), `degenerate_pair` (the
    * tie-broken extremes carry byte-identical texts — a zero-gradient
    * pair), and `top_ties` (how many candidates share the top score —
    * >1 means "chosen" was decided by the tie-break, a labeling-noise
    * signal). The per-prompt extrema ride a prompt-partitioned window
    * over bounded candidate pools, then everything collapses in the
    * same prompt-keyed aggregate.
    */
  def pairAudit(responses: DataFrame, prompt: String, respId: String,
      text: String, score: String): DataFrame = {
    val w = Window.partitionBy(col("prompt_id"))
    val ord = struct(col("sc"), col("resp_id"))
    val withExtrema = responses
      .select(col(prompt).as("prompt_id"), col(respId).as("resp_id"),
        col(text).as("t"), col(score).cast("double").as("sc"))
      .withColumn("mx", max(col("sc")).over(w))
    withExtrema
      .groupBy(col("prompt_id"))
      .agg(count(lit(1)).as("n_responses"),
        (count(lit(1)) < 2).as("too_few"),
        (max(col("sc")) === min(col("sc"))).as("zero_margin"),
        (max_by(col("t"), ord) === min_by(col("t"), ord))
          .as("degenerate_pair"),
        sum(when(col("sc") === col("mx"), 1L).otherwise(0L))
          .as("top_ties"))
  }

  /** Length-bias audit over the derived preference pairs — the
    * reward-hacking check a DPO/RLHF data lead runs before training:
    * if "chosen" is systematically the LONGER response, the reward
    * signal is (partly) a length heuristic and the policy will learn
    * verbosity, not quality. The audit derives the same
    * (chosen, rejected) extremes as [[preferencePairs]] (identical
    * tie-breaks and validity filters) but keeps both sides' token
    * counts, then buckets pairs by the sign of the token-count delta.
    *
    * Output: one row per bucket (`chosen_longer` / `equal_length` /
    * `rejected_longer`) with `n_pairs`, `frac` of all surviving pairs
    * (rounded 6), `avg_len_delta` (chosen − rejected tokens, rounded
    * 4), and `avg_margin` (score margin, rounded 4). A healthy corpus
    * keeps `chosen_longer`'s frac near the rejected bucket's; ~1.0
    * means the scorer is length-confounded.
    *
    * Scale shape: the prompt-keyed constant-state aggregate of
    * [[preferencePairs]], then a 3-row bucket aggregate crossed with a
    * 1-row total — nothing corpus-sized past the first shuffle.
    */
  def lengthBias(responses: DataFrame, prompt: String, respId: String,
      text: String, score: String, minMargin: Double): DataFrame = {
    val ord = struct(col("sc"), col("resp_id"))
    val cand = struct(col("resp_id"), col("t"), col("sc"), col("tk"))
    val pairs = responses
      .select(col(prompt).as("prompt_id"), col(respId).as("resp_id"),
        col(text).as("t"), col(score).cast("double").as("sc"),
        TextAnalysis.tokenCount(col(text)).cast("long").as("tk"))
      .groupBy(col("prompt_id"))
      .agg(count(lit(1)).as("n_responses"),
        max_by(cand, ord).as("ch"), min_by(cand, ord).as("rj"))
      .where(col("n_responses") >= 2 &&
        (col("ch.sc") - col("rj.sc")) >= minMargin &&
        col("ch.t") =!= col("rj.t"))
      .select((col("ch.tk") - col("rj.tk")).as("len_delta"),
        (col("ch.sc") - col("rj.sc")).as("margin"))
    val bucketed = pairs
      .select(
        when(col("len_delta") > 0, lit("chosen_longer"))
          .when(col("len_delta") < 0, lit("rejected_longer"))
          .otherwise(lit("equal_length")).as("bucket"),
        col("len_delta"), col("margin"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("len_delta")), 4).as("avg_len_delta"),
        round(avg(col("margin")), 4).as("avg_margin"))
    val total = bucketed.agg(sum(col("n_pairs")).as("__tot"))
    bucketed.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_pairs"),
        round(col("n_pairs") / col("__tot"), 6).as("frac"),
        col("avg_len_delta"), col("avg_margin"))
  }
}
