package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the perplexity-style
  * quality gate of web-corpus curation (CCNet and friends rank and
  * filter documents by LM score; a cheap count-based bigram model is
  * the classic first tier).
  *
  * Training IS aggregation here: bigram and context counts are two
  * map-side-combined hash aggregates over the exploded corpus, sized
  * by vocabulary, not corpus — AQE broadcasts them back onto the
  * per-document bigram stream when they fit (the usual case), and the
  * score is one keyed aggregate. The only driver-held value is the
  * vocabulary size (one scalar — a model parameter, same altitude as
  * the kmeans centroids).
  */
object NgramLm {

  /** Score every document (≥2 tokens) by its mean add-one-smoothed
    * bigram log-probability under the corpus's own bigram model:
    * mean over positions of ln((c(w1,w2) + 1) / (c(w1,·) + V)).
    *
    * Per-term ln is quantized to 9 decimals and the mean to 4 (the
    * BM25 convention) so independently-computed scores agree across
    * engines to the hash. Output: (id, n_bigrams, avg_logprob).
    * Documents with fewer than two tokens have no bigrams and drop
    * out, mirroring what any SQL re-derivation produces.
    */
  def bigramLogProb(docs: DataFrame, id: String, text: String): DataFrame = {
    // Stage the token array once (HOF-lambda staging rule: an inline
    // split re-runs per produced element), keep only docs with bigrams.
    val staged = docs
      .select(col(id), TextAnalysis.tokens(col(text)).as("__ws"))
      .where(size(col("__ws")) >= 2)
    // One corpus pass produces the bigram stream; localCheckpoint so
    // the two count aggregates and the scoring join all read the
    // materialized stream instead of re-exploding the corpus 3×.
    val bg = staged
      .select(col(id), explode(expr(
        "transform(sequence(0, size(__ws) - 2), " +
          "i -> struct(__ws[i] AS w1, __ws[i + 1] AS w2))")).as("b"))
      .select(col(id), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint()
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cw = bg.groupBy(col("w1")).agg(count(lit(1)).as("cw"))
    val vocab = staged.select(explode(col("__ws")).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    bg.join(cb, Seq("w1", "w2")).join(cw, Seq("w1"))
      .withColumn("lp", round(log(
        (col("cb") + 1L).cast("double") /
          (col("cw") + lit(vocab)).cast("double")), 9))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 4).as("avg_logprob"))
  }
}
