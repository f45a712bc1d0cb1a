package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting: each distinct word votes ±1 on every
  * bit position according to its hash; the sign of the per-position sum
  * is the fingerprint bit. Near-identical documents differ in few bits,
  * so a Hamming-radius block join finds near-dups without an all-pairs
  * product.
  *
  * The bit source is the md5 hex digest, `bitsPerDigit` bits taken from
  * each of its 16 digits (MSB first) — computable identically in Spark
  * and any SQL oracle. `bitsPerDigit = 1` (top bit, 16-bit fingerprint)
  * is compact but too coarse to discriminate at corpus scale;
  * `bitsPerDigit = 4` (64-bit) is the standard SimHash width.
  */
object SimHash {

  val Bits = 16 // width of the default (bitsPerDigit = 1) fingerprint

  /** Typed vote-sum aggregator: the buffer is one Array[Long] of ±1 vote
    * sums per bit. A per-bit `sum()` column (16·b aggregate buffers)
    * either falls out of whole-stage codegen or generates a method too
    * large to JIT; this aggregator replaces both with two tight JVM loops
    * (digit parse, elementwise merge) and still combines map-side — the
    * shuffle carries one compact array row per doc per partition.
    */
  private final class VoteSum(bitsPerDigit: Int)
      extends Aggregator[String, Array[Long], Long] {
    private val bits = 16 * bitsPerDigit
    def zero: Array[Long] = new Array[Long](bits)
    def reduce(buf: Array[Long], h: String): Array[Long] = {
      var d = 0
      while (d < 16) {
        val v = Character.digit(h.charAt(d), 16)
        var k = 0
        while (k < bitsPerDigit) {
          buf(d * bitsPerDigit + k) +=
            (if (((v >> (3 - k)) & 1) == 1) 1L else -1L)
          k += 1
        }
        d += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < bits) { a(i) += b(i); i += 1 }
      a
    }
    // pack MSB-first into one long — bit i of the string form is bit
    // (bits-1-i) of the long
    def finish(buf: Array[Long]): Long = {
      var acc = 0L
      var i = 0
      while (i < bits) { acc = (acc << 1) | (if (buf(i) > 0) 1L else 0L); i += 1 }
      acc
    }
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** (id, simhash) — fingerprint as a '0'/'1' string of length
    * `16 * bitsPerDigit`, MSB-first per digit. One hash-aggregate pass
    * over the exploded word hashes using [[VoteSum]].
    */
  def fingerprints(
      docs: DataFrame, id: String, text: String,
      bitsPerDigit: Int = 1): DataFrame =
    fingerprintsLong(docs, id, text, bitsPerDigit)
      .select(col("id"),
        lpad(bin(col("fp")), 16 * bitsPerDigit, "0").as("simhash"))

  /** (id, fp) — fingerprint packed in one long (MSB-first; the string
    * form is `lpad(bin(fp), bits, '0')`). This is the representation the
    * join paths use: 8 bytes through every shuffle instead of a
    * bits-char string, and Hamming distance is one codegen'd
    * `bit_count(xor)` with no string parsing.
    */
  def fingerprintsLong(
      docs: DataFrame, id: String, text: String,
      bitsPerDigit: Int = 1): DataFrame = {
    require(bitsPerDigit >= 1 && bitsPerDigit <= 4)
    val votes = udaf(new VoteSum(bitsPerDigit))
    Dedup.widen(docs).select(col(id).as("id"),
      explode(array_distinct(split(lower(col(text)), "\\s+"))).as("w"))
      .select(col("id"), md5(col("w")).as("h"))
      .groupBy(col("id"))
      .agg(votes(col("h")).as("fp"))
  }

  /** Near-dup pairs: equal-fingerprint bucket join (Hamming distance 0;
    * wider radii probe by banding the fingerprint — see [[nearPairs]]).
    */
  def identicalPairs(docs: DataFrame, id: String, text: String): DataFrame = {
    val fp = fingerprints(docs, id, text)
    fp.as("a").join(fp.as("b"),
        col("a.simhash") === col("b.simhash") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
  }

  /** Exact Hamming distance between two packed-long fingerprints: one
    * codegen'd XOR + popcount.
    */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Hamming distance between two equal-length '0'/'1' fingerprint
    * STRINGS of width `bits` (the oracle-friendly rendering) — parses via
    * conv() per call, so keep it out of hot paths; joins should carry the
    * packed long and use [[hamming]]. `bits` is required: a default would
    * silently ignore the tail of wider fingerprints.
    */
  def hammingStr(a: Column, b: Column, bits: Int): Column =
    (0 until bits by 32).map { off =>
      bit_count(conv(substring(a, off + 1, 32), 2, 10).cast("long")
        .bitwiseXOR(conv(substring(b, off + 1, 32), 2, 10).cast("long")))
    }.reduce(_ + _)

  /** Near-dup pairs within Hamming distance `maxDist` — the standard
    * block-permutation scheme (Manku et al. WWW'07): split the
    * fingerprint into `maxDist + 1` blocks; two fingerprints within
    * distance d differ in at most d blocks, so by pigeonhole they agree
    * on at least one whole block. Candidates are generated by joining on
    * (block index, block bits) — never all pairs — then verified with the
    * exact popcount distance. Scales as bucket collisions, like the
    * MinHash-LSH path; 64-bit fingerprints (`bitsPerDigit = 4`) keep the
    * 16-bit-per-block bucket space sparse enough for large corpora.
    */
  def nearPairs(
      docs: DataFrame, id: String, text: String,
      maxDist: Int = 3, bitsPerDigit: Int = 4): DataFrame =
    nearPairsFromFingerprints(
      fingerprintsLong(docs, id, text, bitsPerDigit),
      maxDist, 16 * bitsPerDigit)

  /** The block-join core of [[nearPairs]], over an ALREADY-FINGERPRINTED
    * `(id, fp)` table — any packed-long Hamming space plugs in: text
    * SimHash, image dHash ([[graft.multimodal.Multimodal.dhashImage]]),
    * audio fingerprints. Fingerprints are MSB-aligned: `bits < 64` means
    * only the LOW `bits` bits carry signal and the high bits must be 0.
    */
  def nearPairsFromFingerprints(
      fp: DataFrame, maxDist: Int, bits: Int): DataFrame = {
    val nBlocks = maxDist + 1
    require(bits % nBlocks == 0, s"$nBlocks blocks must divide $bits bits")
    val blockLen = bits / nBlocks
    // block b (MSB-first) as an integer join key: block index in the high
    // bits, block value in the low — all integer ops, no string slicing
    val mask = if (blockLen == 64) -1L else (1L << blockLen) - 1
    val banded = fp.select(col("id"), col("fp"),
      explode(array((0 until nBlocks).map { b =>
        val shift = (nBlocks - 1 - b) * blockLen
        lit(b.toLong << blockLen).bitwiseOR(
          shiftrightunsigned(col("fp"), shift).bitwiseAND(lit(mask)))
      }: _*)).as("block"))
    // verify BEFORE deduplicating: the popcount filter is a codegen'd
    // per-row expression, so collision rows stream through it map-side
    // and only qualifying pairs (a pair can match in up to d+1 blocks)
    // reach the dropDuplicates shuffle — the reverse order would shuffle
    // every candidate with both fingerprints attached
    banded.as("a").join(banded.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        hamming(col("a.fp"), col("b.fp")).cast("int").as("dist"))
      .where(col("dist") <= maxDist)
      .dropDuplicates("id1", "id2")
  }
}
