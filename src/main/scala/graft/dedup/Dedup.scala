package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-level deduplication operators for large-scale text corpora.
  *
  * Three tiers, by cost and recall:
  *  - exact:   one hash-aggregate pass (fingerprint groupBy)
  *  - jaccard: EXACT near-dup pairs via an inverted-index join — no
  *    all-pairs product, but token-frequency skew can fan out; intended
  *    for verification and small/medium corpora
  *  - minhash: banded MinHash-LSH — the 100 TB path: per-doc signatures,
  *    candidate pairs only within equal LSH buckets, then exact
  *    verification of the candidates. Cost scales with corpus size +
  *    bucket collisions, never with the pair product.
  */
object Dedup {

  /** Ensure a compute-bound stage has at least one partition per core:
    * a small-but-dense input (one parquet file) otherwise pins the whole
    * shingle/signature computation to a single task. No-op when the input
    * is already wide (the 100 TB case — real datasets arrive pre-split).
    */
  private[graft] def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Word n-gram shingle set (lowercased, whitespace-tokenized). */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(lower(text), "\\s+")
    when(size(words) >= n,
      array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + lit(1), lit(n))))))
      .otherwise(array_distinct(array(concat_ws(" ", words))))
  }

  /** Exact dedup: fingerprint groupBy keeping the smallest id
    * (the distributed form of "drop exact duplicates").
    */
  def exact(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(md5(col(text)).as("fp"))
      .agg(min(col(id)).as("keeper"), count(lit(1)).as("n_dups"))

  /** EXACT word-set Jaccard pairs ≥ threshold via inverted index:
    * token → sorted doc pairs sharing it → intersection counts → Jaccard.
    * No cartesian product; the fanout is Σ df(token)² — acceptable when
    * token document-frequencies are bounded, otherwise use minhash().
    */
  def jaccardPairs(
      docs: DataFrame, id: String, text: String,
      threshold: Double, maxDf: Option[Long] = None): DataFrame = {
    val allWords = widen(docs).select(col(id).as("id"),
      explode(array_distinct(split(lower(col(text)), "\\s+"))).as("w"))
    // Optional scale valve: tokens in more than maxDf documents are
    // excluded from pair GENERATION (they dominate the Σ df² fanout while
    // discriminating nothing). A capped run is a candidate filter — pairs
    // sharing only ultra-common tokens are missed, so exact semantics
    // require maxDf = None; true scale runs should use minhash() instead.
    val words = maxDf match {
      case None => allWords
      case Some(cap) =>
        val rare = allWords.groupBy(col("w"))
          .agg(count(lit(1)).as("df")).where(col("df") <= cap)
          .select(col("w"))
        allWords.join(broadcast(rare), "w")
    }
    val sizes = words.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = words.as("a").join(words.as("b"),
        col("a.w") === col("b.w") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id1")
        .withColumnRenamed("sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2")
        .withColumnRenamed("sz", "sz2"), "id2")
      .withColumn("jaccard",
        col("inter") / (col("sz1") + col("sz2") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** MinHash-LSH candidate pairs: deterministic seeded xxhash64 minhash
    * signatures over the shingle set, xor-banded into `bands` buckets of
    * `numHashes / bands` rows; docs colliding in any band become a
    * candidate pair. Deterministic across runs/retries (no RNG state).
    */
  def minhashCandidates(
      docs: DataFrame, id: String, text: String,
      numHashes: Int = 128, bands: Int = 32, shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // one string hash per shingle, then numHashes seeded hashes of that
    // 8-byte base value — each behaves as an independent permutation for
    // min-hashing at a fraction of the cost of re-hashing the string
    // (and no overflowing arithmetic, which ANSI mode would reject)
    val sh = widen(docs).select(col(id).as("id"),
      explode(shingles(col(text), shingleN)).as("sh"))
      .withColumn("base", xxhash64(col("sh")))
    val sigCols = (0 until numHashes).map(i =>
      min(xxhash64(lit(i.toLong), col("base"))).as(s"h$i"))
    val sig = sh.groupBy(col("id")).agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"h$i")): _*)
          .as("bh"))
    }
    val banded = sig
      .select(col("id"), explode(array(bandCols: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
      .distinct()
  }

  /** MinHash-LSH near-dup detection with exact verification: LSH prunes
    * the pair space, then every candidate's true shingle Jaccard is
    * computed and thresholded — output contains no false positives, and
    * with bands=32/rows=4 the probability of missing a pair at
    * J ≥ 0.8 is (1 - 0.8⁴)³² ≈ 5·10⁻⁸ per pair.
    */
  def minhashPairs(
      docs: DataFrame, id: String, text: String, threshold: Double,
      numHashes: Int = 128, bands: Int = 32, shingleN: Int = 3): DataFrame = {
    val cands = minhashCandidates(docs, id, text, numHashes, bands, shingleN)
    val sets = widen(docs).select(col(id).as("id"),
      shingles(col(text), shingleN).as("set"))
    cands
      .join(sets.select(col("id").as("id1"), col("set").as("set1")), "id1")
      .join(sets.select(col("id").as("id2"), col("set").as("set2")), "id2")
      .withColumn("jaccard",
        size(array_intersect(col("set1"), col("set2"))) /
          size(array_union(col("set1"), col("set2"))))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }
}
