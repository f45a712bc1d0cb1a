package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for unsplittable hot keys — the join-shaped form of
  * the lesson SURVEY §4 records for the LSH band join: AQE splits
  * partitions, not keys, so ONE key carrying a disproportionate share
  * of the left side serializes through one task no matter the config.
  * The fix is algebraic: manufacture finer keys whose union is the
  * original semantics.
  *
  * Construction (inner equi-join, left side skewed, right side keyed
  * uniquely or small-per-key): the left row's join key gains a salt
  * `hash(row) % salts`; the right side replicates each row across ALL
  * `salts` salt values. Every (left, right) pair meets in exactly one
  * salted key, so the result is EXACTLY the unsalted join — but the hot
  * key's rows now spread over `salts` shuffle partitions.
  *
  * Cost: the right side shuffles `salts`× — pay it only when the left
  * is skewed and the right is the dimension side (cf. round-4 finding:
  * "salting is for skew, not a default").
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `leftKey == rightKey`, salted.
    * Output columns = left columns ++ right columns (minus the right
    * key, which equals the left key).
    */
  def inner(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val reserved = Seq("__sj_salt")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"column names $reserved are reserved")
    // salt from the full left row hash: spreads even identical rows
    val saltedLeft = left.withColumn("__sj_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)).cast("int"))
    val replicatedRight = right.withColumn("__sj_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
          saltedLeft("__sj_salt") === replicatedRight("__sj_salt"))
      .drop(replicatedRight(rightKey))
      .drop("__sj_salt")
  }
}
