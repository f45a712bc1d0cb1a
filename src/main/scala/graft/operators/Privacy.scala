package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity auditing — the privacy gate a dataset release runs over
  * its quasi-identifier columns (the attributes an adversary can link
  * against an external table: language × domain × rounded length, zip ×
  * age × sex, …): a row is re-identifiable when its quasi-identifier
  * combination is shared by fewer than k rows, so the audit reports
  * every equivalence class with its size and an at-risk flag, and the
  * summary collapses that to the release decision numbers (how many
  * classes/rows sit below k).
  *
  * Scale shape: one hash aggregate keyed by the quasi-identifier tuple
  * (map-side combined); the summary is a second aggregate over the
  * class table, which is bounded by the identifier-domain product,
  * not the corpus.
  */
object Privacy {

  /** One row per quasi-identifier equivalence class:
    * (quasi..., group_n, at_risk = group_n < k). */
  def kAnonymityAudit(df: DataFrame, quasi: Seq[String], k: Int)
      : DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("at_risk", col("group_n") < k)
  }

  /** The release-decision scalar row: total classes/rows, how many of
    * each are below k, and the minimum class size (the dataset's
    * actual k-anonymity level). */
  def kAnonymitySummary(df: DataFrame, quasi: Seq[String], k: Int)
      : DataFrame =
    kAnonymityAudit(df, quasi, k)
      .agg(
        count(lit(1)).as("n_classes"),
        sum(col("group_n")).as("n_rows"),
        sum(when(col("at_risk"), 1L).otherwise(0L)).as("classes_at_risk"),
        sum(when(col("at_risk"), col("group_n")).otherwise(0L))
          .as("rows_at_risk"),
        min(col("group_n")).as("k_actual"))
}
