package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-language-model subword tokenization (Kudo 2018,
  * arXiv:1804.10959 — the SentencePiece unigram algorithm), the trained
  * counterpart of [[Bpe]]: instead of greedily growing merges, start
  * from an over-complete candidate vocabulary (frequent substrings),
  * fit piece probabilities by EM over each word's segmentation lattice,
  * and prune low-utility pieces until the target vocabulary size —
  * encoding is then the Viterbi (max-probability) segmentation.
  *
  * Distributed shape — identical cost discipline to [[Bpe.train]]: ONE
  * corpus pass builds the word-frequency table (vocabulary-sized,
  * orders of magnitude smaller than the corpus), and everything
  * after — seeding, every EM iteration, pruning — runs on that table
  * only. When the word table fits the driver budget the EM loop runs in
  * driver memory (the kmeans small-model/large-data split); above it
  * the loop stays fully distributed: the piece table broadcasts (it
  * only ever shrinks from `seedSize`), each E-step is one
  * word-table-sized flatMap into per-piece expected counts and a
  * PIECE-keyed aggregate whose output is vocabulary-sized, and the
  * M-step is a driver-side normalization of that vocab-sized result.
  * The corpus is never touched again after the first pass.
  *
  * Determinism: no RNG anywhere. Seeding breaks count ties on the
  * lexicographically smaller piece; EM is plain maximum-likelihood
  * (Kudo's Bayesianified digamma M-step is deliberately simplified
  * away — documented deviation), per-word expected contributions and
  * final log-probs quantize to 9 decimals (the kmeans precedent: the
  * rounding absorbs aggregation fold-order noise, so driver and
  * distributed training agree — UnigramLmSpec pins the parity), and
  * pruning ranks on (expected count desc, piece asc) with single
  * characters exempt (coverage: every word must stay segmentable).
  */
object UnigramLm {

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** All positioned substrings of `w` up to `maxLen` chars, with
    * multiplicity (one per start position) — the candidate generator
    * and the lattice edge set share this definition.
    */
  private[text] def substrings(w: String, maxLen: Int): Iterator[String] =
    for {
      i <- (0 until w.length).iterator
      l <- (1 to math.min(maxLen, w.length - i)).iterator
    } yield w.substring(i, i + l)

  /** Candidate-piece statistics — the corpus-sized stage of unigram-LM
    * training, exposed as a driver-checkable query (the
    * [[Bpe.pairStats]] pattern): positioned-substring counts (length ≤
    * `maxLen`) over the word-frequency table, deterministic top-`k`
    * (cnt desc, piece asc). The corpus collapses to the word table in
    * one map-side-combined pass; the substring explosion then runs over
    * vocabulary-sized data — exactly the cost shape of [[train]]'s
    * seeding step.
    */
  def seedStats(docs: DataFrame, text: String, maxLen: Int, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    wordTable(docs, text)
      .flatMap { case (w, c) => substrings(w, maxLen).map((_, c)) }
      .toDF("piece", "c")
      .groupBy(col("piece")).agg(sum(col("c")).as("cnt"))
      .orderBy(col("cnt").desc, col("piece"))
      .limit(k)
  }

  /** The single corpus-sized pass: whitespace words → (word, count),
    * lineage flattened so the training loop never re-reads the corpus.
    */
  private def wordTable(docs: DataFrame, text: String): Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(split(lower(trim(col(text))), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .localCheckpoint()
  }

  /** Forward-backward expected piece counts for ONE occurrence of
    * `word` under the current log-probs: returns (piece → expected
    * count, word log-likelihood). Pieces absent from `logp` are
    * non-edges; single characters are assumed present (train keeps
    * them), so every word has at least the all-singletons path.
    * Contributions round to 9 decimals (fold-order parity — see object
    * doc). A word with no path (unknown character) contributes nothing.
    */
  private[text] def expectedCounts(
      word: String, logp: collection.Map[String, Double],
      maxLen: Int): (Map[String, Double], Double) = {
    val n = word.length
    val NegInf = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else { val m = math.max(a, b); m + math.log1p(math.exp(-math.abs(a - b))) }
    val alpha = Array.fill(n + 1)(NegInf)
    alpha(0) = 0.0
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i) {
      val p = logp.getOrElse(word.substring(j, i), NegInf)
      if (p != NegInf && alpha(j) != NegInf) alpha(i) = lse(alpha(i), alpha(j) + p)
    }
    if (alpha(n) == NegInf) return (Map.empty, 0.0)
    val beta = Array.fill(n + 1)(NegInf)
    beta(n) = 0.0
    for (j <- n - 1 to 0 by -1; i <- j + 1 to math.min(n, j + maxLen)) {
      val p = logp.getOrElse(word.substring(j, i), NegInf)
      if (p != NegInf && beta(i) != NegInf) beta(j) = lse(beta(j), p + beta(i))
    }
    val out = scala.collection.mutable.Map[String, Double]()
    for (j <- 0 until n; i <- j + 1 to math.min(n, j + maxLen)) {
      val piece = word.substring(j, i)
      val p = logp.getOrElse(piece, NegInf)
      if (p != NegInf && alpha(j) != NegInf && beta(i) != NegInf) {
        val e = math.exp(alpha(j) + p + beta(i) - alpha(n))
        out(piece) = out.getOrElse(piece, 0.0) + e
      }
    }
    (out.map { case (k, v) => k -> round9(v) }.toMap, alpha(n))
  }

  /** Raw E-step: expected piece counts over the word table, each word's
    * contribution weighted by its frequency and rounded to 9 decimals.
    */
  private def rawCounts(
      words: Iterable[(String, Long)], logp: collection.Map[String, Double],
      maxLen: Int): Map[String, Double] = {
    val acc = scala.collection.mutable.Map[String, Double]()
    words.foreach { case (w, c) =>
      expectedCounts(w, logp, maxLen)._1.foreach { case (p, e) =>
        acc(p) = acc.getOrElse(p, 0.0) + round9(e * c)
      }
    }
    acc.toMap
  }

  /** One in-memory EM step over the word table: E = [[rawCounts]],
    * M = maximum-likelihood renormalization. Characters that end a
    * step with zero expected count keep a tiny floor so coverage never
    * breaks (they re-enter if later pruning makes them load-bearing).
    */
  private[text] def emStep(
      words: Iterable[(String, Long)], logp: collection.Map[String, Double],
      maxLen: Int): Map[String, Double] =
    normalize(rawCounts(words, logp, maxLen), logp)

  private val CharFloor = 1e-9

  /** The M-step shared by the driver and distributed paths: drop pieces
    * with zero expected count unless single-char (coverage floor),
    * renormalize, round log-probs to 9 decimals.
    */
  private def normalize(
      acc: collection.Map[String, Double],
      prev: collection.Map[String, Double]): Map[String, Double] = {
    val kept = prev.keysIterator.map { p =>
      val e = acc.getOrElse(p, 0.0)
      p -> (if (e <= 0.0 && p.length == 1) CharFloor else e)
    }.filter(_._2 > 0.0).toMap
    val total = kept.valuesIterator.sum
    kept.map { case (p, e) => p -> round9(math.log(e) - math.log(total)) }
  }

  /** Prune to `target` pieces: rank on (expected count desc, piece asc)
    * under the CURRENT model's E-step, single characters exempt.
    * (Deviation from Kudo's exact loss-delta pruning, documented: the
    * expected-count ranking is the standard cheap surrogate and keeps
    * the whole round one E-step.)
    */
  private def pruneRanked(
      counts: collection.Map[String, Double],
      vocab: collection.Map[String, Double], target: Int): Set[String] = {
    val (chars, multi) = vocab.keysIterator.partition(_.length == 1)
    val charSet = chars.toSet
    val keepN = math.max(0, target - charSet.size)
    val kept = multi.toSeq
      .map(p => (p, counts.getOrElse(p, 0.0)))
      .sortBy { case (p, e) => (-e, p) }
      .take(keepN).map(_._1)
    charSet ++ kept
  }

  /** Train a unigram-LM vocabulary of (at most) `vocabSize` pieces.
    * Returns (piece, logp) with logp rounded to 9 decimals, sorted
    * (logp desc, piece asc) — rank 0 first, like [[Bpe.train]]'s merge
    * order.
    *
    * Shape: one corpus pass → word table; seed = top `seedSize`
    * substrings (length ≤ `maxPieceLen`) by positioned-occurrence count
    * plus every single character; then rounds of `emIters` EM steps +
    * a prune to max(vocabSize, ceil(size × `shrink`)) until the target
    * holds, and one final EM pass. Under `driverVocabBudget` words the
    * loop runs on the driver; above it, distributed with identical
    * semantics (same 9-decimal quantization — UnigramLmSpec pins
    * parity) and the loop's shuffles sized to the word table, not the
    * session default (the [[Bpe.train]] discipline).
    */
  def train(
      docs: DataFrame, text: String, vocabSize: Int,
      seedSize: Int = 8192, maxPieceLen: Int = 4,
      emIters: Int = 2, shrink: Double = 0.75,
      driverVocabBudget: Int = 1 << 21): Seq[(String, Double)] = {
    require(vocabSize > 0, "vocabSize must be positive")
    require(shrink > 0.0 && shrink < 1.0, "shrink must be in (0, 1)")
    val spark = docs.sparkSession
    val words = wordTable(docs, text)
    val probe = words.limit(driverVocabBudget + 1).collect()
    if (probe.length <= driverVocabBudget)
      trainInMemory(probe, vocabSize, seedSize, maxPieceLen, emIters, shrink)
    else {
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try trainLoop(words, vocabSize, seedSize, maxPieceLen, emIters, shrink)
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  private def seedFromCounts(
      counts: Iterable[(String, Long)], seedSize: Int): Map[String, Double] = {
    val chars = counts.filter(_._1.length == 1)
    val multi = counts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedSize)
    val all = (chars ++ multi).toMap
    val total = all.valuesIterator.map(_.toDouble).sum
    all.map { case (p, c) => p -> round9(math.log(c.toDouble) - math.log(total)) }
  }

  private def trainInMemory(
      words: Array[(String, Long)], vocabSize: Int, seedSize: Int,
      maxLen: Int, emIters: Int, shrink: Double): Seq[(String, Double)] = {
    val counts = scala.collection.mutable.Map[String, Long]()
    words.foreach { case (w, c) =>
      substrings(w, maxLen).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
    }
    refine(v => rawCounts(words, v, maxLen),
      seedFromCounts(counts, seedSize), vocabSize, emIters, shrink)
  }

  /** The EM-then-prune refinement shared by the driver and distributed
    * paths — only the E-step implementation differs. Stops early when
    * pruning can no longer shrink the vocabulary (the single-character
    * coverage floor already exceeds `vocabSize`).
    */
  private def refine(
      eCounts: collection.Map[String, Double] => Map[String, Double],
      seed: Map[String, Double], vocabSize: Int, emIters: Int,
      shrink: Double): Seq[(String, Double)] = {
    var vocab = seed
    var stuck = false
    while (vocab.size > vocabSize && !stuck) {
      for (_ <- 0 until emIters) vocab = normalize(eCounts(vocab), vocab)
      val target = math.max(vocabSize, math.ceil(vocab.size * shrink).toInt)
      val keep = pruneRanked(eCounts(vocab), vocab, target)
      if (keep.size >= vocab.size) stuck = true
      else vocab = renorm(vocab.view.filterKeys(keep).toMap)
    }
    vocab = normalize(eCounts(vocab), vocab)
    vocab.toSeq.sortBy { case (p, lp) => (-lp, p) }
  }

  /** Renormalize surviving pieces after a prune (probability mass of
    * dropped pieces redistributes proportionally).
    */
  private def renorm(v: Map[String, Double]): Map[String, Double] = {
    // logsumexp over the kept log-probs
    val m = v.valuesIterator.max
    val z = m + math.log(v.valuesIterator.map(lp => math.exp(lp - m)).sum)
    v.map { case (p, lp) => p -> round9(lp - z) }
  }

  private def trainLoop(
      words: Dataset[(String, Long)], vocabSize: Int, seedSize: Int,
      maxLen: Int, emIters: Int, shrink: Double): Seq[(String, Double)] = {
    val spark = words.sparkSession
    import spark.implicits._
    // seeding: substring counts over the word table; the piece table is
    // vocab-sized so the two collects here are seedSize-bounded
    val counted = words
      .flatMap { case (w, c) => substrings(w, maxLen).map((_, c)) }
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (p, c) => (p, c) }
    val chars = counted.filter(_._1.length == 1).collect()
    val multi = counted.filter(_._1.length > 1)
      .orderBy(col("_2").desc, col("_1")).limit(seedSize).collect()
    def eCounts(vocab: collection.Map[String, Double]): Map[String, Double] = {
      // broadcast the (shrinking) piece model; ONE word-table pass into
      // per-piece contributions; the aggregate output is vocab-sized
      val vb = spark.sparkContext.broadcast(
        collection.immutable.Map.from(vocab))
      val out = words
        .flatMap { case (w, c) =>
          expectedCounts(w, vb.value, maxLen)._1.iterator
            .map { case (p, e) => (p, round9(e * c)) }
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case (p, e) => (p, e) }
        .collect().toMap
      vb.unpersist()
      out
    }
    refine(eCounts, seedFromCounts(chars ++ multi, Int.MaxValue),
      vocabSize, emIters, shrink)
  }

  /** Viterbi (max-log-prob) segmentation of one word under a trained
    * model. Ties break toward the LONGER last piece (smaller split
    * point), so segmentation is deterministic. Characters absent from
    * the vocabulary pass through as singleton pieces scored at the
    * model's minimum (the SentencePiece UNK convention, flattened).
    */
  def viterbi(word: String, logp: collection.Map[String, Double],
      maxLen: Int): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    val n = word.length
    val unk = if (logp.isEmpty) -1e9 else logp.valuesIterator.min - 10.0
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    for (i <- 1 to n) {
      // longest candidate first: on equal score the earlier (smaller j)
      // split wins via strict improvement
      for (j <- math.max(0, i - maxLen) until i) {
        val piece = word.substring(j, i)
        val p = logp.getOrElse(piece,
          if (piece.length == 1) unk else Double.NegativeInfinity)
        if (p != Double.NegativeInfinity && best(j) + p > best(i)) {
          best(i) = best(j) + p
          back(i) = j
        }
      }
    }
    val rev = scala.collection.mutable.ListBuffer[String]()
    var i = n
    while (i > 0) { rev.prepend(word.substring(back(i), i)); i = back(i) }
    rev.toVector
  }

  /** Persist a trained model as one parquet table ((rank, piece, logp),
    * rank = the train-order position) — the tokenizer-artifact half of
    * the persist-once/encode-many lifecycle: a 100 TB corpus tokenizes
    * against ONE frozen artifact across jobs and weeks, and retraining
    * per job would silently shift every token boundary downstream
    * (packing, spans, counts). Parquet rather than a driver-format
    * file so the artifact lives next to the data on the same store and
    * survives engine swaps.
    */
  def save(spark: SparkSession, model: Seq[(String, Double)],
      path: String): Unit = {
    import spark.implicits._
    model.zipWithIndex
      .map { case ((p, lp), r) => (r, p, lp) }
      .toDF("rank", "piece", "logp")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted model in training order ([[save]]'s inverse —
    * UnigramLmSpec pins the byte round-trip).
    */
  def load(spark: SparkSession, path: String): Seq[(String, Double)] = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("rank").cast("int"), col("piece"), col("logp"))
      .as[(Int, String, Double)].collect()
    require(rows.nonEmpty, s"no unigram-LM model at $path")
    rows.sortBy(_._1).map { case (_, p, lp) => (p, lp) }.toSeq
  }

  /** Per-document subword token sequences under a trained model:
    * (id, tokens, n_tokens) — [[Bpe.encodeTokens]]'s shape with Viterbi
    * segmentation. The model broadcasts; one narrow mapPartitions pass,
    * no shuffle.
    */
  def encodeTokens(
      docs: DataFrame, id: String, text: String,
      model: Seq[(String, Double)], maxPieceLen: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mb = spark.sparkContext.broadcast(model.toMap)
    graft.operators.Widen(docs)
      .select(col(id).cast("long"), col(text))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = mb.value
        it.map { case (rowId, t) =>
          val ws = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          val toks = ws.toVector.flatMap(w => viterbi(w, m, maxPieceLen))
          (rowId, toks, toks.length)
        }
      }
      .toDF(id, "tokens", "n_tokens")
      .withColumn("n_tokens", col("n_tokens").cast("int"))
  }
}
