package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenization (Sennrich et al. 2016,
  * arXiv:1508.07909) — the real tokenizer behind LLM token accounting
  * ([[TextAnalysis.subwordCount]] is the cheap regex proxy; this is the
  * trained article).
  *
  * Distributed shape: ONE corpus pass builds the word-frequency table —
  * vocabulary-sized, orders of magnitude smaller than the corpus — and
  * every training iteration runs on that table only: an adjacent-pair
  * count aggregate weighted by word frequency, a deterministic
  * distributed argmax (count desc, then pair lexicographic — no
  * driver-side sort of the pair space), and a map applying the merge.
  * The corpus is never touched again after the first pass, which is the
  * property that makes iterative BPE training tractable at 100 TB: the
  * iteration cost tracks the VOCABULARY, and the word table
  * localCheckpoints each round so lineage stays flat across the loop.
  *
  * Encoding broadcasts the rank table and runs the classic greedy
  * lowest-rank merge loop per word — a per-row pure function at the
  * codec altitude (no built-in expresses stateful adjacent-pair
  * rewriting), exactly like the image/audio decoders.
  *
  * Determinism: no RNG anywhere; count ties break on the
  * lexicographically smaller pair, so retrained merges are identical on
  * every run and partitioning.
  */
object Bpe {

  /** End-of-word marker (the classic formulation: merges ending in it
    * cannot cross word boundaries).
    */
  val Eow = "</w>"

  private[text] def toSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Eow

  /** One merge applied left-to-right: adjacent (a, b) becomes a+b;
    * overlapping occurrences resolve leftmost-first ("aaa" under (a,a)
    * → "aa", "a").
    */
  private[text] def applyMerge(
      syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Train `numMerges` BPE merges over the corpus' whitespace words.
    * Stops early when no adjacent pair reaches `minCount`. Returns the
    * merges in training order (rank 0 first).
    *
    * The corpus-sized work is ONE pass (the word-frequency aggregate);
    * iterations then run over the word table. When the vocabulary fits
    * `driverVocabBudget` the loop runs in driver memory — the standard
    * small-model/large-data split (the kmeans-model pattern: even a
    * 100 TB corpus usually has a driver-sized word list), ~100× faster
    * than paying a Spark job per merge. Above the budget the loop stays
    * fully distributed with identical deterministic semantics
    * (BpeSpec pins the parity). Web-scale noisy vocabularies that
    * overflow the budget train distributed; they pay job-per-merge
    * latency but never move the corpus.
    */
  def train(
      docs: DataFrame, text: String, numMerges: Int,
      minCount: Long = 2L,
      driverVocabBudget: Int = 1 << 21): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // the single corpus-sized pass: whitespace words → (symbols, count)
    val words: Dataset[(Vector[String], Long)] = docs
      .select(explode(split(lower(trim(col(text))), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .map { case (w, c) => (toSymbols(w), c) }
      .localCheckpoint()
    // read budget+1 rows, never the oversized vocabulary (the bookmark
    // budget-guard pattern)
    val probe = words.limit(driverVocabBudget + 1).collect()
    if (probe.length <= driverVocabBudget)
      trainInMemory(probe, numMerges, minCount)
    else {
      // every iteration shuffles the VOCABULARY, not the corpus — size
      // the loop's shuffle to the word table (the stateful-streaming
      // lesson: partition count tracks state cardinality, not the batch
      // setting); N rounds × 32 near-empty partitions is pure overhead
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try trainLoop(words, numMerges, minCount)
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  /** The merge loop over a driver-held word table — identical argmax
    * semantics (count desc, pair lex asc) to [[trainLoop]].
    */
  private def trainInMemory(
      words0: Array[(Vector[String], Long)], numMerges: Int,
      minCount: Long): Seq[(String, String)] = {
    var words = words0
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, n)) => acc match {
          case Some((bp, bn)) if bn > n || (bn == n &&
            (bp._1 < p._1 || (bp._1 == p._1 && bp._2 <= p._2))) => acc
          case _ => Some((p, n))
        }
      }
      best match {
        case Some(((a, b), n)) if n >= minCount =>
          merges += ((a, b))
          words = words.map { case (syms, c) => (applyMerge(syms, a, b), c) }
          round += 1
        case _ => exhausted = true
      }
    }
    merges.result()
  }

  private def trainLoop(
      words0: Dataset[(Vector[String], Long)], numMerges: Int,
      minCount: Long): Seq[(String, String)] = {
    val spark = words0.sparkSession
    import spark.implicits._
    var words = words0
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // pair counts over the word table; argmax via TakeOrdered(1)
      // (count desc, pair lex asc) — per-partition heaps, nothing
      // pair-space-sized ever reaches the driver
      val best = words
        .flatMap { case (syms, c) =>
          syms.iterator.zip(syms.iterator.drop(1)).map(p => ((p._1, p._2), c))
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), n) => (a, b, n) }
        .toDF("a", "b", "n")
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).as[(String, String, Long)]
        .collect().headOption
      best match {
        case Some((a, b, n)) if n >= minCount =>
          merges += ((a, b))
          words = words.map { case (syms, c) => (applyMerge(syms, a, b), c) }
          // flatten lineage every few rounds — a checkpoint job per
          // merge would double the iteration count for a table this
          // small, while unbounded chained maps grow the analysis cost
          // quadratically across 40+ rounds
          if (round % 4 == 3) words = words.localCheckpoint()
          round += 1
        case _ => exhausted = true
      }
    }
    merges.result()
  }

  /** Adjacent-symbol pair statistics over the char-level (iteration-0)
    * segmentation — the corpus-sized stage of BPE training, exposed as
    * a driver-checkable query: (a, b, cnt) for the `k` most frequent
    * adjacent symbol pairs, total-ordered (cnt desc, a asc, b asc) so
    * the top-k is deterministic. The corpus collapses to the word table
    * in one pass (map-side combined groupBy); the pair explosion then
    * runs over vocabulary-sized data — exactly the cost shape of
    * [[train]]'s first iteration.
    */
  def pairStats(docs: DataFrame, text: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(split(lower(trim(col(text))), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .flatMap { case (w, c) =>
        val syms = toSymbols(w)
        (0 until syms.length - 1).map(i => (syms(i), syms(i + 1), c))
      }
      .toDF("a", "b", "c")
      .groupBy(col("a"), col("b")).agg(sum(col("c")).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Persist a trained merge list as one parquet table ((rank, a, b),
    * rank = training order — the rank table IS the tokenizer) — the
    * artifact half of the persist-once/encode-many lifecycle, same
    * rationale as [[UnigramLm.save]]: a corpus tokenizes against ONE
    * frozen artifact across jobs; retraining per job would silently
    * shift every token boundary downstream.
    */
  def save(spark: SparkSession, merges: Seq[(String, String)],
      path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted merge list in training order ([[save]]'s inverse —
    * BpeSpec pins the round-trip).
    */
  def load(spark: SparkSession, path: String): Seq[(String, String)] = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("rank").cast("int"), col("a"), col("b"))
      .as[(Int, String, String)].collect()
    require(rows.nonEmpty, s"no BPE merge list at $path")
    rows.sortBy(_._1).map { case (_, a, b) => (a, b) }.toSeq
  }

  /** Encode one word with the greedy lowest-rank-first merge loop (the
    * GPT-2 reference algorithm): repeatedly merge every occurrence of
    * the known pair with the smallest rank until none remains.
    */
  def encodeWord(
      word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = toSymbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else syms = applyMerge(syms, bestPair._1, bestPair._2)
    }
    syms
  }

  /** Per-document subword token sequences under a trained merge list:
    * (id, tokens: array<string>, n_tokens) — the actual tokenizer
    * output a training pipeline feeds to packing
    * ([[TextAnalysis.packSequences]]) or a vocab-id lookup join. Words
    * are encoded independently (whitespace pre-tokenization, same as
    * [[encodeCounts]]) and concatenated in document order. The rank
    * table broadcasts; one narrow mapPartitions pass, no shuffle.
    */
  def encodeTokens(
      docs: DataFrame, id: String, text: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    graft.operators.Widen(docs)
      .select(col(id).cast("long"), col(text))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = ranksB.value
        it.map { case (rowId, t) =>
          val ws = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          val toks = ws.toVector.flatMap(w => encodeWord(w, ranks))
          (rowId, toks, toks.length)
        }
      }
      .toDF(id, "tokens", "n_tokens")
      .withColumn("n_tokens", col("n_tokens").cast("int"))
  }

  /** Per-document subword accounting under a trained merge list:
    * (id, n_words, n_subwords). The rank table broadcasts; encoding is
    * a narrow mapPartitions pass — no shuffle, no state.
    */
  def encodeCounts(
      docs: DataFrame, id: String, text: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    graft.operators.Widen(docs)
      .select(col(id).cast("long"), col(text))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = ranksB.value
        it.map { case (rowId, t) =>
          val ws = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          val n = ws.foldLeft(0L)((acc, w) => acc + encodeWord(w, ranks).length)
          (rowId, ws.length, n)
        }
      }
      .toDF(id, "n_words", "n_subwords")
      .withColumn("n_words", col("n_words").cast("int"))
  }
}
