package graft.ann

import graft.SparkSpec

class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  // 2-dim corpus with hand-rankable cosines; labels are the relevance.
  private val corpus = Seq(
    (0L, Seq(1.0f, 0.0f), "A"),
    (1L, Seq(1.0f, 0.0f), "A"),   // sim 1.0 to q0
    (2L, Seq(0.0f, 1.0f), "B"),   // sim 0.0
    (3L, Seq(0.6f, 0.8f), "A"),   // sim 0.6
    (4L, Seq(0.8f, 0.6f), "B"),   // sim 0.8
    (5L, Seq(0.0f, 1.0f), "C")    // the only C: zero relevant universe
  ).toDF("vec_id", "embedding", "label")

  private def metrics(qIds: Long*) =
    RetrievalEval.retrievalMetrics(
      corpus, "vec_id", "embedding", "label",
      corpus.filter($"vec_id".isin(qIds: _*)),
      "vec_id", "embedding", "label", k = 3)
      .as[(Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

  test("recall, rr and ndcg match the hand computation") {
    val m = metrics(0L)(0L)
    // top-3 for q0: id1 (1.0, rel), id4 (0.8), id3 (0.6, rel)
    assert(m._2 == 2L && m._3 == 2L)        // n_rel, hits
    assert(m._4 == 1.0 && m._5 == 1.0)      // recall, rr (first hit rank 1)
    val idcg = 1.0 + math.rint(1e9 / math.log(3.0) * math.log(2.0)) / 1e9
    assert(math.abs(m._6 - 1.5 / idcg) < 1e-6)
  }

  test("first relevant below rank 1 gives a fractional rr") {
    // q2 = (0,1), label B. Sims: id5 1.0 (C), id3 0.8 (A), id4 0.6 (B),
    // ids 0/1 0.0 -> first B sits at rank 3 -> rr = 1/3.
    val m = metrics(2L)(2L)
    assert(m._3 == 1L && m._5 == 0.333333)
  }

  test("a query with an empty relevant universe zeroes every metric") {
    val m = metrics(5L)(5L)
    assert(m._2 == 0L && m._3 == 0L)
    assert(m._4 == 0.0 && m._5 == 0.0 && m._6 == 0.0)
  }

  test("a query whose top-k run is empty still reports a zeroed row") {
    // corpus = only the query's own row: self-exclusion leaves nothing
    // to rank, but "per query" means the row must still appear
    val solo = corpus.filter($"vec_id" === 0L)
    val out = RetrievalEval.retrievalMetrics(
      solo, "vec_id", "embedding", "label",
      solo, "vec_id", "embedding", "label", k = 3)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(out.toSeq == Seq((0L, 0L, 0L, 0.0, 0.0, 0.0)))
  }
}
