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

  /** l-diversity audit — k-anonymity's necessary complement: a class
    * can be k-large yet leak the SENSITIVE attribute outright when
    * every member shares it (the homogeneity attack — "all 12 people
    * in this zip/age class have the same diagnosis"). Per
    * quasi-identifier class this reports `group_n`, `l_distinct`
    * (distinct sensitive values), `top_sensitive_frac` (the modal
    * sensitive value's share, rounded 4 — the adversary's posterior
    * confidence), and `at_risk = l_distinct < l`.
    *
    * Scale shape: one (quasi × sensitive) hash aggregate (map-side
    * combined) then a class-keyed re-aggregate — both bounded by the
    * identifier-domain product, never corpus-wide state.
    */
  def lDiversityAudit(df: DataFrame, quasi: Seq[String],
      sensitive: String, l: Int): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy((quasi :+ sensitive).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(quasi.map(col): _*)
      .agg(sum(col("__c")).as("group_n"),
        count(lit(1)).as("l_distinct"),
        max(col("__c")).as("__top"))
      .select((quasi.map(col) ++ Seq(col("group_n"), col("l_distinct"),
        round(col("__top") / col("group_n"), 4).as("top_sensitive_frac"),
        (col("l_distinct") < l).as("at_risk"))): _*)
  }

  /** t-closeness audit — the distribution-skew gate l-diversity misses:
    * a class can hold l distinct sensitive values yet still leak ("2 of
    * the 3 diagnoses in this class are cancer" when cancer is 1% of the
    * corpus). Per quasi-identifier class this reports the total
    * variation distance between the class's sensitive-value distribution
    * and the corpus-wide one:
    *
    *   TVD = ½ Σ_v |p_class(v) − p_global(v)|
    *       = ½ (Σ_{v∈class} |p_c(v) − p_g(v)| + 1 − Σ_{v∈class} p_g(v))
    *
    * — the second form needs only the values PRESENT in the class (the
    * absent-value terms collapse to their global mass), so no per-class
    * densification over the sensitive domain. `at_risk` compares the
    * ROUNDED tvd against t so the decision reproduces from the report.
    *
    * Scale shape: one (quasi × sensitive) hash aggregate, the global
    * sensitive distribution (sensitive-domain-sized, broadcast) joined
    * in, then a class-keyed re-aggregate — all bounded by identifier
    * domains, never corpus-wide state. TVD is the categorical EMD with
    * the discrete metric; for ORDERED sensitive attributes bucket them
    * first (the generalization step k-anonymity already uses).
    */
  def tClosenessAudit(df: DataFrame, quasi: Seq[String],
      sensitive: String, t: Double): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0 && t < 1, s"t must be in (0,1), got $t")
    val cell = df.groupBy((quasi :+ sensitive).map(col): _*)
      .agg(count(lit(1)).cast("double").as("__c"))
      .withColumn("__gn", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(quasi.map(col): _*)))
    val glob = df.groupBy(col(sensitive))
      .agg(count(lit(1)).cast("double").as("__g"))
    val n = df.agg(count(lit(1)).cast("double").as("__n"))
    cell.join(broadcast(glob), sensitive)
      .crossJoin(broadcast(n))
      .groupBy(quasi.map(col): _*)
      .agg(max(col("__gn")).cast("long").as("group_n"),
        sum(abs(col("__c") / col("__gn") - col("__g") / col("__n")))
          .as("__sa"),
        sum(col("__g") / col("__n")).as("__sp"))
      .select((quasi.map(col) ++ Seq(col("group_n"),
        round((col("__sa") + lit(1.0) - col("__sp")) / 2, 4).as("tvd"),
        (round((col("__sa") + lit(1.0) - col("__sp")) / 2, 4) > t)
          .as("at_risk"))): _*)
  }
}
