package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling WITHOUT replacement
  * (Efraimidis–Spirakis A-ES): each row draws a uniform `u` from an
  * md5 hash of its key and competes with key `-ln(u) / w`; the k
  * smallest keys are exactly a weighted sample without replacement.
  *
  * Properties that matter at corpus scale:
  *  - One pass, no RNG state, no rejection loop: retries, backfills and
  *    partial re-runs select the identical sample (same reasoning as the
  *    md5-bucket split/stratified samplers, SparkEntry so6/so7).
  *  - The global variant plans as TakeOrderedAndProject — per-partition
  *    top-k then a k-row driver merge, never a full sort.
  *  - The per-group variant delegates to [[Salted.topKPerGroup]], so a
  *    skewed stratum is ranked in salts·k-bounded windows, not one task.
  *
  * The sampling key is rounded to 12 decimals (floor(x·1e12 + 0.5)
  * convention) with the row key as tie-break: `ln` differs in the last
  * ulp across engines, and an ordering must not hinge on it.
  */
object WeightedSample {

  /** The A-ES competition key: `-ln(u)/w`, u ∈ (0, 1] derived from the
    * first 8 md5 hex digits of `id`. `weight` must be strictly positive
    * (zero-weight rows would get key = +Infinity and sort last — filter
    * them out instead of relying on that).
    */
  def esKey(id: Column, weight: Column): Column = {
    val v = conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")
    val u = (v + 1).cast("double") / lit(4294967296.0)
    floor(-log(u) / weight.cast("double") * 1e12 + 0.5) / 1e12
  }

  /** Global weighted sample of k rows (no replacement). Output carries
    * the sampling key as `skey` for auditability.
    */
  def take(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame =
    df.withColumn("skey", esKey(col(idCol), col(weightCol)))
      .orderBy(col("skey"), col(idCol))
      .limit(k)

  /** Weighted sample of k rows per group — the quota-sampling shape
    * (e.g. "50k documents per language, proportional to length within
    * each").
    */
  def takePerGroup(df: DataFrame, idCol: String, weightCol: String,
      groupCols: Seq[String], k: Int, salts: Int = 16): DataFrame =
    Salted.topKPerGroup(
      df.withColumn("skey", esKey(col(idCol), col(weightCol))),
      groupCols = groupCols,
      orderCols = Seq(col("skey"), col(idCol)),
      k = k, salts = salts)
}
