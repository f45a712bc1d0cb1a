package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters: the bounded-memory frequent-items sketch
  * for censuses whose exact group-by would shuffle an unbounded key
  * space (token vocabularies, URLs, user agents at 100 TB).
  *
  * The summary keeps at most `capacity` counters; `merge` adds
  * counter-wise then decrements by the (capacity+1)-th largest count —
  * the standard mergeable-summaries construction (Agarwal et al. 2012),
  * which preserves the deterministic guarantee
  * `true_count - n/(capacity+1) <= estimate <= true_count`. Every item
  * with frequency > n/(capacity+1) is guaranteed present; when the
  * distinct-key count fits `capacity` the estimates are EXACT (no
  * decrement ever fires), which is what the oracle entry pins.
  *
  * Shape: one typed Aggregator pass — map-side combined, one
  * capacity-bounded map per partition through the shuffle, no explode'd
  * key space. Output is long-format (item, est) rows.
  */
object FrequentItems {

  private final class MisraGries(capacity: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    private def shrink(m: mutable.HashMap[String, Long]): Unit =
      if (m.size > capacity) {
        // decrement all by the (capacity+1)-th largest count and drop <=0
        val cut = m.values.toArray.sorted(Ordering[Long].reverse)(capacity)
        val dead = mutable.ArrayBuffer.empty[String]
        m.mapValuesInPlace((_, v) => v - cut)
        m.foreach { case (k, v) => if (v <= 0) dead += k }
        dead.foreach(m.remove)
      }

    def reduce(m: mutable.HashMap[String, Long], item: String): mutable.HashMap[String, Long] = {
      m.updateWith(item) { case Some(v) => Some(v + 1); case None => Some(1L) }
      shrink(m)
      m
    }

    def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (k, v) =>
        a.updateWith(k) { case Some(x) => Some(x + v); case None => Some(v) }
      }
      shrink(a)
      a
    }

    def finish(m: mutable.HashMap[String, Long]): Map[String, Long] = m.toMap

    // kryo: catalyst has no native encoder for mutable maps, and the
    // buffer only crosses the wire at partial-aggregate boundaries
    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Heavy hitters of `item` (one row per input occurrence): long-format
    * (item, est) for every surviving counter, estimate-descending ties
    * broken by item. `capacity` bounds memory; guarantee as above.
    */
  def topItems(df: DataFrame, item: Column, capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val mg = udaf(new MisraGries(capacity))
    df.select(item.cast("string").as("item"))
      .agg(mg(col("item")).as("sketch"))
      .select(explode(col("sketch")).as(Seq("item", "est")))
      .orderBy(col("est").desc, col("item"))
  }

  /** Per-group heavy hitters: one capacity-bounded sketch per group
    * (domain vocabularies, per-study error censuses). Memory is
    * `groups × capacity` counters — the group column must be coarse
    * (languages, domains), which is exactly the heavy-hitters use case.
    */
  def topItemsPerGroup(df: DataFrame, groupCols: Seq[String],
      item: Column, capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val mg = udaf(new MisraGries(capacity))
    df.select(groupCols.map(col) :+ item.cast("string").as("item"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(mg(col("item")).as("sketch"))
      .select(groupCols.map(col) :+ explode(col("sketch")).as(Seq("item", "est")): _*)
      .orderBy(groupCols.map(col) ++ Seq(col("est").desc, col("item")): _*)
  }
}
