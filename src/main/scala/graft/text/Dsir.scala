package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw-corpus
  * document by how much more likely its hashed-bigram profile is under
  * a small TARGET distribution (the domain you want more of) than under
  * the raw distribution itself — `Σ_b n_b(doc) · ln(p̂_t(b) / p̂_r(b))`
  * with add-one smoothing over `buckets` hash buckets. Resampling the
  * corpus by these weights is the published recipe for tilting a web
  * crawl toward a target domain without training a classifier.
  *
  * Scale shape: the per-document bucket profile `(id, bucket, n)` is
  * computed ONCE (one explode + one map-side-combined aggregate) and
  * localCheckpointed; the raw bucket marginal is a second aggregate OVER
  * THE PROFILE (bucket-sized, never a second corpus pass), the target
  * marginal is one pass over the (small) target side, and the
  * `buckets`-row log-ratio model joins back broadcast — the corpus
  * never shuffles by anything but (id, bucket), and nothing driver-held
  * scales with the corpus (the two totals are scalar aggregates riding
  * the same count jobs).
  *
  * The bucket hash (`md5` low 24 bits mod `buckets`) and the ln
  * quantization (9 decimals per bucket, 4 on the final score — the BM25
  * convention) are chosen to be bit-reproducible in any SQL engine.
  * Documents with <2 tokens have no bigrams and drop out.
  * Output: (id, n_bigrams, dsir_score).
  */
object Dsir {

  def importanceWeights(
      raw: DataFrame, target: DataFrame, id: String, text: String,
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")

    def bucketStream(docs: DataFrame): DataFrame = docs
      .select(col(id), TextAnalysis.tokens(col(text)).as("__ws"))
      .where(size(col("__ws")) >= 2)
      .select(col(id), explode(expr(
        "transform(sequence(0, size(__ws) - 2), " +
          "i -> concat(__ws[i], ' ', __ws[i + 1]))")).as("bg"))
      .select(col(id),
        pmod(conv(substring(md5(col("bg")), 1, 6), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bucket"))

    // (id, bucket, n) — the only corpus-sized intermediate, materialized
    // once for both the raw marginal and the scoring join
    val profile = bucketStream(raw)
      .groupBy(col(id), col("bucket")).agg(count(lit(1)).as("n"))
      .localCheckpoint()

    val rawCounts = profile.groupBy(col("bucket")).agg(sum(col("n")).as("cr"))
    val tgtCounts = bucketStream(target)
      .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val rawTotal = profile.agg(sum(col("n"))).head().getLong(0)
    val tgtTotal = tgtCounts.agg(sum(col("ct"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }

    // log-ratio model: every bucket a raw doc can contain appears in
    // rawCounts, so a left join covers the scoring domain; target
    // buckets never seen stay at the smoothing floor ct = 0
    val model = rawCounts
      .join(tgtCounts, Seq("bucket"), "left")
      .select(col("bucket"), round(
        log((coalesce(col("ct"), lit(0L)) + 1L).cast("double") /
          lit((tgtTotal + buckets).toDouble)) -
          log((col("cr") + 1L).cast("double") /
            lit((rawTotal + buckets).toDouble)), 9).as("lr"))

    profile.join(broadcast(model), Seq("bucket"))
      .groupBy(col(id))
      .agg(sum(col("n")).as("n_bigrams"),
        round(sum(col("n") * col("lr")), 4).as("dsir_score"))
  }
}
