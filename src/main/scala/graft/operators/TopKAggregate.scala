package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k per group WITHOUT a sort window. The `row_number() over
  * (partition by g order by score)` idiom shuffles and sorts EVERY
  * scored row only to discard all but k per group — at |corpus|·|Q|
  * scored rows (the ANN scan shape) the sort dominates the stage. This
  * bounded-buffer Aggregator keeps the k best (score desc, id asc)
  * entries per group with map-side partial aggregation: the shuffle
  * carries at most k tuples per (group × map partition), never the
  * scored stream, and no sort ever runs.
  *
  * The buffer is a k-bounded sorted Seq (insertion O(k) — k is a small
  * constant; a heap's O(log k) would save nothing at k ≤ 100 and cost
  * encoder complexity). Determinism: the (score desc, id asc) order is
  * total, so partial merges commute and the result is independent of
  * partitioning — the same guarantee the window form's ORDER BY gives,
  * minus the sort.
  *
  * Versus [[Salted]]'s two-phase salted rank (the OTHER window
  * alternative): salting still sorts, but keeps full codegen and
  * handles "k large / arbitrary ordering" cases; this aggregate never
  * sorts and shrinks the shuffle itself, at the cost of an imperative
  * (non-codegen) agg buffer — prefer it when the scored stream
  * dominates the stage and k is small, salting when k is large or the
  * ordering isn't a (score, id) pair. At bench scale (500k scored
  * rows) the two time identically; the separation is a cluster-scale
  * shuffle-volume argument, not a local-bench one (measured honestly
  * in STRESS r10: both flat).
  */
object TopKAggregate {

  final class TopKByScore(k: Int) extends Aggregator[
      (Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k > 0, "k must be > 0")

    // java.lang.Double.compare, not </>: IEEE comparisons are false in
    // both directions for NaN (and the id tie-break fires only on score
    // EQUALITY, which NaN never satisfies), which would make the buffer
    // order partitioning-dependent the moment a NaN score (zero-norm
    // vector) enters. The total order ranks NaN above every real score —
    // the same ordering Spark's sort gives DoubleType, so rank-window
    // parity holds for NaN inputs too.
    private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }

    private def insert(b: Seq[(Double, Long)], x: (Double, Long))
        : Seq[(Double, Long)] =
      if (b.length >= k && better(b.last, x)) b
      else {
        val (hi, lo) = b.span(better(_, x))
        ((hi :+ x) ++ lo).take(k)
      }

    def zero: Seq[(Double, Long)] = Nil
    def reduce(b: Seq[(Double, Long)], a: (Double, Long))
        : Seq[(Double, Long)] = insert(b, a)
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)])
        : Seq[(Double, Long)] = b.foldLeft(a)(insert)
    def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** `(group, rank, id, score)` rows: the k best (score desc, id asc)
    * per group via the bounded-buffer aggregate — drop-in for the
    * rank-window idiom with a shuffle of k-row states instead of the
    * scored stream.
    */
  def topKPerGroup(df: DataFrame, group: Column, score: Column,
      id: Column, k: Int): DataFrame = {
    val agg = udaf(new TopKByScore(k))
    df.groupBy(group.as("g"))
      .agg(agg(score.cast("double"), id.cast("long")).as("__top"))
      .select(col("g"), posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col("g"), (col("__p") + 1).cast("int").as("rank"),
        col("__e._2").as("id"), col("__e._1").as("score"))
  }
}
