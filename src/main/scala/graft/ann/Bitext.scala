package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk, "Margin-based
  * Parallel Corpus Mining with Multilingual Sentence Embeddings",
  * ACL 2019 — the LASER/CCMatrix recipe): mine translation pairs from
  * two monolingual corpora embedded in a shared space. Raw cosine is a
  * bad mined-pair score — hubness inflates some rows' similarity to
  * EVERYTHING — so each candidate is scored by its margin over the
  * average of its neighborhoods:
  *
  *   margin(x, y) = cos(x, y) / ((avgₖ(x, NNₖ(x)) + avgₖ(y, NNₖ(y))) / 2)
  *
  * (the "ratio" variant). Candidates are the union of forward and
  * backward nearest neighbors (each source row nominates its top
  * target and vice versa); a pair found in both directions is the
  * classic high-precision signal, and the margin threshold (~1.05–1.2
  * in the papers) tunes the precision/recall trade.
  *
  * Determinism: sims round to 4 before ranking (ties by the other
  * side's id), margins round to 4 before the threshold — the
  * cross-engine contract every ANN entry uses.
  *
  * Scale shape: the scoring is one |S|×|T| cross join with the smaller
  * side broadcast — the brute verification baseline. At corpus scale
  * the SAME margin arithmetic runs over [[Ann.ivfTopK]]'s
  * cluster-pruned scored stream per direction (margin needs only each
  * row's top-k), which is exactly how CCMatrix mined 4.5B pairs. The
  * per-direction reductions are one rank window + one k-row-bounded
  * aggregate each; nothing wider than (id, id, sim) shuffles.
  */
object Bitext {

  def minePairs(
      src: DataFrame, sId: String, sVec: String,
      tgt: DataFrame, tId: String, tVec: String,
      k: Int, marginThreshold: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val s = src.select(col(sId).as("src_id"),
        col(sVec).cast("array<double>").as("__sv"))
      .withColumn("__sn", sqrt(Ann.dot(col("__sv"), col("__sv"))))
    val t = tgt.select(col(tId).as("tgt_id"),
        col(tVec).cast("array<double>").as("__tv"))
      .withColumn("__tn", sqrt(Ann.dot(col("__tv"), col("__tv"))))
    val scored = graft.operators.Widen(s).crossJoin(broadcast(t))
      .select(col("src_id"), col("tgt_id"),
        round(Ann.dot(col("__sv"), col("__tv")) /
          (col("__sn") * col("__tn")), 4).as("sim"))
      .localCheckpoint() // reused by both direction windows + the join
    val fwd = scored.withColumn("r", row_number().over(
      Window.partitionBy(col("src_id"))
        .orderBy(col("sim").desc, col("tgt_id").asc)))
      .where(col("r") <= k)
    val bwd = scored.withColumn("r", row_number().over(
      Window.partitionBy(col("tgt_id"))
        .orderBy(col("sim").desc, col("src_id").asc)))
      .where(col("r") <= k)
    marginFromRuns(fwd, bwd, marginThreshold)
  }

  /** [[minePairs]] with the scoring stage swapped for [[Ann.ivfTopK]]
    * in both directions — the corpus-scale path: each direction scores
    * only `nprobe` clusters per query instead of the full |S|×|T|
    * matrix, and the margin reduction is IDENTICAL (it needs only each
    * row's pruned top-k; at nprobe = #clusters the result EQUALS the
    * brute [[minePairs]], which is how the entry stays exactly
    * oracle-checkable while executing the probe machinery — the
    * recall-at-lower-nprobe trade is BitextSpec's territory).
    *
    * Both corpora must carry a cluster assignment (train with
    * [[Ann.kmeans]] or use [[Ann.pivotCentroids]]' labels) and DISJOINT
    * id spaces — ivfTopK drops q_id = neighbor_id rows, which across
    * two corpora would silently eat a legitimate pair on an id clash.
    */
  def minePairsIvf(
      src: DataFrame, sId: String, sVec: String, sCluster: String,
      tgt: DataFrame, tId: String, tVec: String, tCluster: String,
      k: Int, nprobe: Int, marginThreshold: Double,
      sCents: Option[DataFrame] = None,
      tCents: Option[DataFrame] = None): DataFrame = {
    val fwd = Ann.ivfTopK(tgt, tId, tVec, tCluster,
        src, sId, sVec, k, nprobe, tCents)
      .select(col("q_id").as("src_id"), col("neighbor_id").as("tgt_id"),
        col("sim"), col("rank").as("r"))
    val bwd = Ann.ivfTopK(src, sId, sVec, sCluster,
        tgt, tId, tVec, k, nprobe, sCents)
      .select(col("neighbor_id").as("src_id"), col("q_id").as("tgt_id"),
        col("sim"), col("rank").as("r"))
    marginFromRuns(fwd, bwd, marginThreshold)
  }

  /** The margin reduction shared by the brute and IVF paths: `fwd` is
    * each source row's ≤k-ranked target run (src_id, tgt_id, sim, r),
    * `bwd` each target row's ≤k-ranked source run in the SAME column
    * shape (r ranks within tgt_id). Candidates are the two rank-1
    * nominations unioned; each neighborhood mean is a k-row-bounded
    * aggregate on the key its run already grouped by.
    */
  def marginFromRuns(fwd: DataFrame, bwd: DataFrame,
      marginThreshold: Double): DataFrame = {
    val fwdAvg = fwd.groupBy(col("src_id")).agg(avg(col("sim")).as("__as"))
    val bwdAvg = bwd.groupBy(col("tgt_id")).agg(avg(col("sim")).as("__at"))
    val cand = fwd.where(col("r") === 1)
      .select(col("src_id"), col("tgt_id"), col("sim"))
      .unionAll(bwd.where(col("r") === 1)
        .select(col("src_id"), col("tgt_id"), col("sim")))
      .distinct()
    cand.join(fwdAvg, "src_id").join(bwdAvg, "tgt_id")
      .select(col("src_id"), col("tgt_id"), col("sim"),
        round(col("sim") / ((col("__as") + col("__at")) / 2), 4)
          .as("margin"))
      .where(col("margin") >= marginThreshold)
  }
}
