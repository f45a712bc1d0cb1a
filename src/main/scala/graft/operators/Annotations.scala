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
}
