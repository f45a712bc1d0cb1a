package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting: each distinct word votes ±1 on every
  * bit position according to its hash; the sign of the per-position sum
  * is the fingerprint bit. Near-identical documents differ in few bits,
  * so a Hamming-radius bucket join finds near-dups without an all-pairs
  * product.
  *
  * The bit source is the top bit of each md5 hex digit (16 bits), which
  * both Spark and any SQL oracle can compute identically.
  */
object SimHash {

  val Bits = 16

  private val highDigits = Seq("8", "9", "a", "b", "c", "d", "e", "f")

  /** (id, simhash) — fingerprint emitted as a 16-char '0'/'1' string. */
  def fingerprints(docs: DataFrame, id: String, text: String): DataFrame = {
    val words = Dedup.widen(docs).select(col(id).as("id"),
      explode(array_distinct(split(lower(col(text)), "\\s+"))).as("w"))
      .select(col("id"), md5(col("w")).as("h"))
    words
      .select(col("id"), col("h"), explode(sequence(lit(1), lit(Bits))).as("i"))
      .groupBy(col("id"), col("i"))
      .agg(sum(when(expr("substring(h, i, 1)").isin(highDigits: _*), 1)
        .otherwise(-1)).as("s"))
      .groupBy(col("id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("i"),
            when(col("s") > 0, "1").otherwise("0").as("bit")))),
          x => x.getField("bit")), "").as("simhash"))
  }

  /** Near-dup pairs: equal-fingerprint bucket join (Hamming distance 0;
    * wider radii probe by banding the fingerprint).
    */
  def identicalPairs(docs: DataFrame, id: String, text: String): DataFrame = {
    val fp = fingerprints(docs, id, text)
    fp.as("a").join(fp.as("b"),
        col("a.simhash") === col("b.simhash") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
  }
}
