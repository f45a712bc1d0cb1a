package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** pass@k — the code-eval estimator (Chen et al. 2021, "Evaluating
  * Large Language Models Trained on Code"): per problem with n samples
  * of which c pass, the unbiased probability that at least one of k
  * drawn samples passes is 1 − C(n−c, k)/C(n, k). Computing it per
  * problem over a samples table is the reduction step of every
  * HumanEval-style evaluation pipeline.
  *
  * Numerics: the binomial ratio is computed as ONE division of two
  * integer products (Π(n−c−i) / Π(n−i), factors clamped at 0 so
  * n−c < k collapses to pass@k = 1) — the exact-integer-in-double
  * shape the SQL oracle reproduces term for term, not a per-factor
  * quotient whose fold order could drift. Problems with n < k report
  * null (the estimator is undefined, not zero).
  *
  * Scale shape: one problem-keyed hash aggregate (map-side combined)
  * then per-row constant-k arithmetic; output is |problems| rows.
  */
object PassAtK {

  /** (problem, n, c, pass_at_1, pass_at_k) with fractions rounded 6;
    * `correct` is any column coercible to 0/1 long.
    */
  def passAtK(df: DataFrame, problem: String, correct: String, k: Int)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val g = df.groupBy(col(problem).as("problem"))
      .agg(count(lit(1)).as("n"),
        sum(col(correct).cast("long")).as("c"))
    val num = aggregate(sequence(lit(0), lit(k - 1)),
      lit(1L), (acc, i) => acc * greatest(col("n") - col("c") - i, lit(0L)))
    val den = aggregate(sequence(lit(0), lit(k - 1)),
      lit(1L), (acc, i) => acc * (col("n") - i))
    g.select(col("problem"), col("n"), col("c"),
      round(col("c") / col("n"), 6).as("pass_at_1"),
      when(col("n") >= k,
        round(lit(1.0) - num.cast("double") / den, 6)).as(s"pass_at_$k"))
  }
}
