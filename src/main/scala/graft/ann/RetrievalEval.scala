package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval evaluation — the metric layer an embedding/ANN pipeline is
  * judged by: given a corpus and a query set with relevance labels,
  * score the brute-force cosine run and report per-query recall@k,
  * reciprocal rank, and nDCG@k. This is what turns the repo's ANN tier
  * from "returns neighbors" into "returns neighbors we can put a
  * number on" — the same role the `ann_recall*` gates play for the
  * approximate indexes, generalized to ranking quality against
  * label relevance.
  *
  * Scale shape: the run is [[Ann.topK]] (queries broadcast, corpus
  * never shuffles to score); the run itself is |Q|·k rows — TINY — so
  * it broadcasts into the corpus-sized label join, and the per-query
  * relevant-count join is again broadcast-query-side. Nothing
  * corpus-sized ever shuffles; swap the run stage for `ivfTopK` when
  * the corpus outgrows brute force (the metrics layer is unchanged).
  */
object RetrievalEval {

  /** Per-query ranking metrics of the cosine top-k run, relevance =
    * label equality (the query's own corpus row is excluded, matching
    * [[Ann.topK]]'s self-exclusion). Output per query:
    * `n_rel` (relevant corpus rows), `hits` (relevant in top-k),
    * `recall_at_k` = hits / n_rel (uncapped — against ALL relevant,
    * not min(k, n_rel)), `rr` = 1/rank of the first relevant (0 when
    * none), `ndcg_at_k` with binary gains. Fractions round to 6;
    * per-rank log gains quantize to 9 decimals BEFORE summing so the
    * engine/oracle fold order can't drift the sum.
    */
  def retrievalMetrics(
      corpus: DataFrame, id: String, vec: String, label: String,
      queries: DataFrame, qId: String, qVec: String, qLabel: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be > 0")
    val run = Ann.topK(corpus, id, vec, queries, qId, qVec, k)
    val qlab = queries
      .select(col(qId).as("q_id"), col(qLabel).as("__ql"))
    val nlab = corpus
      .select(col(id).as("neighbor_id"), col(label).as("__nl"))
    // run is |Q|*k rows: broadcast it into the corpus-sized label join
    val scored = nlab.join(
      broadcast(run.join(broadcast(qlab), Seq("q_id"))),
      Seq("neighbor_id"))
    val gain = round(lit(1.0) / log(2.0, col("rank") + lit(1.0)), 9)
    val perQuery = scored.groupBy(col("q_id"))
      .agg(
        sum(when(col("__nl") === col("__ql"), 1L).otherwise(0L))
          .as("hits"),
        max(when(col("__nl") === col("__ql"),
          round(lit(1.0) / col("rank"), 9))).as("__rr"),
        sum(when(col("__nl") === col("__ql"), gain).otherwise(lit(0.0)))
          .as("__dcg"))
    // relevant-universe size per query: broadcast the query set over
    // the corpus, count same-label rows excluding the query's own row
    val nRel = corpus.select(col(id).as("__cid"), col(label).as("__cl"))
      .join(broadcast(qlab),
        col("__cl") === col("__ql") && col("__cid") =!= col("q_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_rel"))
    val idealRanks = sequence(lit(1), least(lit(k), col("n_rel")).cast("int"))
    val idcg = aggregate(
      transform(idealRanks,
        i => round(lit(1.0) / log(2.0, i.cast("double") + lit(1.0)), 9)),
      lit(0.0), (acc, x) => acc + x)
    // anchor on the QUERY SET, not the scored run: a query whose run is
    // empty (the corpus holds only its own row) must still report a
    // zeroed row — "per query" means every query
    qlab.select(col("q_id"))
      .join(broadcast(perQuery), Seq("q_id"), "left")
      .join(broadcast(nRel), Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("__rr"), col("__dcg"))
      .select(col("q_id"), col("n_rel"), col("hits"),
        round(when(col("n_rel") > 0, col("hits") / col("n_rel"))
          .otherwise(lit(0.0)), 6).as("recall_at_k"),
        round(coalesce(col("__rr"), lit(0.0)), 6).as("rr"),
        round(when(col("n_rel") > 0,
          coalesce(col("__dcg"), lit(0.0)) / idcg)
          .otherwise(lit(0.0)), 6).as("ndcg_at_k"))
  }
}
