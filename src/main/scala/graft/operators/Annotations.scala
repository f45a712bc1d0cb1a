package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Annotation aggregation — the step between raw human (or LLM-judge)
  * labels and a training set: several annotators label each item, and
  * the pipeline needs the consensus label plus how contested it was,
  * because downstream curation drops or down-weights low-agreement
  * items and routes them to re-annotation.
  *
  * Scale shape: one item-keyed hash aggregate over the label log
  * (map-side combined); the per-item label histogram is bounded by the
  * label vocabulary, never by the corpus. No windows, no driver state.
  */
object Annotations {

  /** Majority vote with agreement stats. Output per item:
    * `vote` (the modal label; ties broken by the LOWER label, so the
    * result is deterministic), `n_annotations`, `n_agree` (votes for
    * the winner), `agreement` = n_agree / n_annotations rounded to 4,
    * and `unanimous`.
    */
  def majorityVote(labels: DataFrame, item: String, label: String)
      : DataFrame = {
    val perLabel = labels
      .groupBy(col(item).as("item"), col(label).as("lab"))
      .agg(count(lit(1)).as("c"))
    perLabel
      .groupBy(col("item"))
      .agg(
        // modal label, ties to the lexicographically smaller label:
        // max_by on (count, inverted-tiebreak) would need a struct
        // ordering trick; (c desc, lab asc) via min_by on a struct of
        // (-c, lab) keeps it a single pass
        min_by(col("lab"), struct((-col("c")).as("nc"), col("lab")))
          .as("vote"),
        sum(col("c")).as("n_annotations"),
        max(col("c")).as("n_agree"))
      .select(col("item"), col("vote"), col("n_annotations"),
        col("n_agree"),
        round(col("n_agree") / col("n_annotations"), 4).as("agreement"),
        (col("n_agree") === col("n_annotations")).as("unanimous"))
  }

  /** Fleiss' kappa — chance-corrected inter-annotator agreement over
    * the whole label log, the number a data lead reads before trusting
    * (or re-briefing) an annotation campaign. Raw agreement
    * ([[majorityVote]]'s per-item fraction) over-credits skewed label
    * distributions; kappa subtracts the agreement a label-marginal
    * random rater would reach.
    *
    * Items with fewer than 2 ratings carry no agreement signal and are
    * excluded everywhere (per-item P_i AND the label marginals), so a
    * half-annotated batch doesn't bias P_e. Unequal per-item rating
    * counts use the standard generalization: P_i is computed with the
    * item's own n_i, and the marginals p_j weight by assignments.
    *
    * Output is ONE row: `n_items`, `n_ratings`, `n_categories`,
    * `p_bar` (observed agreement), `p_e` (chance agreement), `kappa`,
    * the fractions rounded to 6.
    *
    * Scale shape: item×label hash aggregate (map-side combined) →
    * item aggregate → two scalar aggregates joined by a 1×1 cross —
    * the corpus collapses to constant driver-side state; no windows,
    * no collect.
    */
  def fleissKappa(labels: DataFrame, item: String, label: String)
      : DataFrame = {
    val cell = labels
      .groupBy(col(item).as("i"), col(label).as("j"))
      .agg(count(lit(1)).as("c"))
    // per-item n_i and Σ_j n_ij²; items with n_i < 2 drop here, and the
    // item-keyed join below removes their cells from the marginals too
    // (same partitioning as cell — no extra shuffle of the label log).
    val items = cell
      .groupBy(col("i"))
      .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("s2"))
      .where(col("n") >= 2)
    val pBar = items
      .select(col("n"),
        ((col("s2") - col("n")) / (col("n") * (col("n") - lit(1))))
          .as("pi"))
      .agg(count(lit(1)).as("n_items"), sum(col("n")).as("n_ratings"),
        avg(col("pi")).as("pb"))
    val pe = cell.join(items.select(col("i")), Seq("i"))
      .groupBy(col("j")).agg(sum(col("c")).as("cj"))
      .agg(count(lit(1)).as("n_categories"),
        (sum(col("cj") * col("cj")) /
          (sum(col("cj")) * sum(col("cj")))).as("pe"))
    pBar.crossJoin(pe)
      .select(col("n_items"), col("n_ratings"), col("n_categories"),
        round(col("pb"), 6).as("p_bar"), round(col("pe"), 6).as("p_e"),
        // κ is UNDEFINED at p_e = 1 (a single observed category leaves
        // no chance variation to beat): NaN, not an ANSI
        // division-by-zero crash — the degenerate-panel case the
        // property generator legitimately produces
        round(when(col("pe") < lit(1.0),
            (col("pb") - col("pe")) / (lit(1.0) - col("pe")))
          .otherwise(lit(Double.NaN)), 6).as("kappa"))
  }
}
