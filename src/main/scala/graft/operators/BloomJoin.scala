package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.BloomContains

/** Bloom-filter prefiltered joins — the scale technique for a semi/inner
  * join where the probe side is enormous and the build side's KEY SET is
  * small enough to sketch but possibly too large to broadcast as rows.
  *
  * Shape:
  *
  *  1. Build: hash each build-side key twice (`xxhash64`), OR the k
  *     derived bit positions into a fixed-size bitset via a typed
  *     [[Aggregator]] with a primitive `Array[Long]` buffer (the
  *     map-side-combined, codegen-friendly wide-aggregate shape — see
  *     SURVEY §4 round-3 findings). The single sketch row is collected
  *     to the driver — a FIXED-size (≤ [[MaxBits]]/8 = 8 MiB) budgeted
  *     hop, the same way Spark's own runtime filters execute their
  *     build subquery, and the same model-vs-corpus rule as the kmeans
  *     centroids: the MODEL may visit the driver, the corpus never does.
  *  2. Probe: a plain deterministic `Filter` on the probe side — the
  *     sketch rides into the plan as an array literal when small
  *     (≤ [[MaxLiteralWords]] words) or a broadcast variable otherwise,
  *     through the native codegen [[graft.functions.BloomContains]]
  *     expression. Being a plain filter, Catalyst keeps it BELOW the
  *     exact join next to the scan (the earlier cross-join formulation
  *     was defeated by PushLeftSemiThroughJoin hoisting the exact join
  *     underneath it). False positives pass (bounded by `fpp`), false
  *     negatives cannot happen.
  *  3. Exact join: the surviving fraction of the probe side flows into
  *     an ordinary exact join, whose shuffle now moves only prefiltered
  *     rows.
  *
  * This is the manual form of Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.*`), exposed as an operator
  * for the cases the optimizer won't inject: a build side that is itself
  * a derived frame, cross-format joins, or a reusable precomputed sketch.
  *
  * Mirrors the reference's membership-style lookups (J2/J4 —
  * bootstrap_trigger.py:228-250, s3_to_json_s3.py:515-556) at the scale
  * where shipping the key set is no longer free.
  */
object BloomJoin {

  /** Salt appended to the key columns for the second, independent
    * xxhash64 — golden-ratio constant, same spirit as the band seeds in
    * [[graft.dedup.Dedup]].
    */
  val H2Salt: Long = 0x9E3779B97F4A7C15L

  /** Hard cap on bitset size: 2^26 bits = 8 MiB — one driver hop +
    * broadcast of this is noise, and it fits ~6M keys at 1% fpp. Above
    * the implied key count a Bloom prefilter stops paying anyway (use a
    * partitioned exact join).
    */
  val MaxBits: Long = 1L << 26

  /** Sketches up to this many words (128 KiB) ride the plan as an array
    * literal — codegen-visible, no broadcast round-trip; larger ones go
    * through a broadcast variable (same tiering as the kmeans model,
    * `ann/Ann.scala`).
    */
  val MaxLiteralWords: Int = 16384

  /** Optimal (m bits, k hashes) for `expectedItems` at `fpp`, with m
    * rounded up to a whole number of 64-bit words and capped at
    * [[MaxBits]] (past the cap the realized fpp degrades gracefully —
    * exactness never depends on it).
    */
  def sizing(expectedItems: Long, fpp: Double): (Long, Int) = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val ln2 = math.log(2)
    // cap in double space: the ideal size overflows Long for huge counts
    val ideal = math.min(
      -expectedItems.toDouble * math.log(fpp) / (ln2 * ln2),
      MaxBits.toDouble)
    val m = math.min(MaxBits,
      math.max(64L, (math.ceil(ideal).toLong + 63) / 64 * 64))
    val k = math.max(1, math.round(ln2 * m / expectedItems).toInt)
    (m, k)
  }

  /** Probe position i from the two key hashes — Kirsch-Mitzenmacher
    * double hashing with wrap-around Long arithmetic (deliberately JVM
    * arithmetic, not SQL: ANSI mode rejects the intended overflow).
    * [[graft.functions.BloomContains]]'s codegen inlines exactly this.
    */
  def position(h1: Long, h2: Long, i: Int, mBits: Long): Long = {
    var c = h1 + i.toLong * h2
    if (c < 0) c = ~c
    c % mBits
  }

  /** JVM-side membership test over a raw word array — the broadcast-var
    * probe path; arithmetic identical to [[BloomContains]].
    */
  def mightContain(words: Array[Long], h1: Long, h2: Long,
      k: Int, mBits: Long): Boolean = {
    var i = 0
    while (i < k) {
      val pos = position(h1, h2, i, mBits)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L)
        return false
      i += 1
    }
    true
  }

  /** Typed aggregator OR-ing each key's k probe bits into one bitset.
    * Buffer = primitive long words; partial aggregation merges bitsets
    * per partition, so the shuffle carries one `m/64`-word row per
    * partition regardless of key count.
    */
  private final class BitsetOr(mBits: Long, k: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long]((mBits >>> 6).toInt)
    def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      var i = 0
      while (i < k) {
        val pos = position(in._1, in._2, i, mBits)
        buf((pos >>> 6).toInt) |= 1L << (pos & 63L).toInt
        i += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  private def hashes(keys: Seq[Column]): (Column, Column) =
    (xxhash64(keys: _*), xxhash64(keys :+ lit(H2Salt): _*))

  /** The sketch of `keys` of `build`: distributed bitset aggregation,
    * one fixed-size row to the driver. Reusable: compute once, prefilter
    * many probes.
    */
  def bitset(build: DataFrame, keys: Seq[Column],
      expectedItems: Long, fpp: Double): Array[Long] = {
    val (m, k) = sizing(expectedItems, fpp)
    val (h1, h2) = hashes(keys)
    val or = udaf(new BitsetOr(m, k))
    build.select(h1.as("h1"), h2.as("h2"))
      .agg(or.apply(col("h1"), col("h2")).as("bits"))
      .head().getAs[scala.collection.Seq[Long]]("bits").toArray
  }

  /** `probe` rows whose `keys` pass the Bloom membership test — a
    * superset of the true matches (fpp-bounded), never a subset. A
    * plain deterministic filter: pushes to the probe scan, composes
    * under joins.
    */
  def prefilter(probe: DataFrame, keys: Seq[Column], bits: Array[Long],
      expectedItems: Long, fpp: Double): DataFrame = {
    val (m, k) = sizing(expectedItems, fpp)
    require(bits.length == (m >>> 6).toInt,
      s"sketch has ${bits.length} words, sizing expects ${m >>> 6}")
    val (h1, h2) = hashes(keys)
    val predicate =
      if (bits.length <= MaxLiteralWords)
        BloomContains.contains(typedlit(bits), h1, h2, lit(k), lit(m))
      else {
        val bc = probe.sparkSession.sparkContext.broadcast(bits)
        udf((a: Long, b: Long) => mightContain(bc.value, a, b, k, m))
          .apply(h1, h2)
      }
    probe.filter(predicate)
  }

  /** Exact left-semi join of `probe` against `build` keys, with the
    * probe side Bloom-prefiltered below the exact join's shuffle.
    * Output rows/columns are exactly `probe ⋉ build` — the sketch only
    * decides how much of `probe` the exact join has to move.
    */
  def semiJoin(probe: DataFrame, build: DataFrame,
      probeKeys: Seq[String], buildKeys: Seq[String],
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(probeKeys.nonEmpty && probeKeys.length == buildKeys.length,
      "probeKeys and buildKeys must be same-length and non-empty")
    val sketch = bitset(build, buildKeys.map(build(_)), expectedItems, fpp)
    val pre = prefilter(probe, probeKeys.map(probe(_)), sketch,
      expectedItems, fpp)
    val buildSide = build.select(buildKeys.map(build(_)): _*)
    val cond = probeKeys.zip(buildKeys)
      .map { case (p, b) => pre(p) === buildSide(b) }
      .reduce(_ && _)
    pre.join(buildSide, cond, "left_semi")
  }
}
