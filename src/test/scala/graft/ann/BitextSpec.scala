package graft.ann

import graft.SparkSpec

class BitextSpec extends SparkSpec {
  import spark.implicits._

  // Shared space with two planted translation pairs, one hub, and one
  // stray. src 1 <-> tgt 11 and src 2 <-> tgt 12 are near-parallel;
  // tgt 13 is a hub (moderately similar to BOTH sources); src 3 points
  // nowhere.
  private val src = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 1.0f)))
    .toDF("vec_id", "embedding")
  private val tgt = Seq(
    (11L, Seq(0.99f, 0.1f, 0.0f)),
    (12L, Seq(0.1f, 0.99f, 0.0f)),
    (13L, Seq(0.7f, 0.7f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("minePairs mines the planted pairs and the margin demotes the " +
      "hub below them") {
    val out = Bitext.minePairs(src, "vec_id", "embedding",
        tgt, "vec_id", "embedding", k = 2, marginThreshold = 0.0)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // the two planted pairs are mutual top-1 and carry the top margins
    assert(out.contains((1L, 11L)) && out.contains((2L, 12L)))
    val planted = Seq(out((1L, 11L))._2, out((2L, 12L))._2)
    val others = out.view.filterKeys(k => k != ((1L, 11L)) &&
      k != ((2L, 12L))).values.map(_._2)
    assert(others.forall(m => planted.forall(_ > m)))
    // src 3 is orthogonal to every target: its nomination scores sim 0
    assert(out.keys.count(_._1 == 3L) <= 1)
  }

  test("a margin threshold drops low-margin nominations but keeps the " +
      "mutual pairs") {
    val all = Bitext.minePairs(src, "vec_id", "embedding",
      tgt, "vec_id", "embedding", k = 2, marginThreshold = 0.0).count()
    val cut = Bitext.minePairs(src, "vec_id", "embedding",
        tgt, "vec_id", "embedding", k = 2, marginThreshold = 1.01)
      .as[(Long, Long, Double, Double)].collect()
    assert(cut.length < all)
    assert(cut.map(r => (r._1, r._2)).toSet
      .intersect(Set((1L, 11L), (2L, 12L))) == Set((1L, 11L), (2L, 12L)))
    assert(cut.forall(_._4 >= 1.01))
  }

  test("minePairsIvf at nprobe=all equals the brute miner; nprobe=1 " +
      "stays inside the probed cluster") {
    // two well-separated clusters per side so pivot centroids are clean
    val src2 = Seq(
      (2L, Seq(1.0f, 0.0f, 0.0f), 0), (4L, Seq(0.9f, 0.1f, 0.0f), 0),
      (6L, Seq(0.0f, 0.0f, 1.0f), 1), (8L, Seq(0.0f, 0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val tgt2 = Seq(
      (1L, Seq(0.95f, 0.05f, 0.0f), 0), (3L, Seq(1.0f, 0.2f, 0.0f), 0),
      (5L, Seq(0.0f, 0.05f, 0.95f), 1), (7L, Seq(0.1f, 0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val brute = Bitext.minePairs(src2, "vec_id", "embedding",
        tgt2, "vec_id", "embedding", k = 2, marginThreshold = 0.0)
      .as[(Long, Long, Double, Double)].collect().toSet
    val ivf = Bitext.minePairsIvf(src2, "vec_id", "embedding", "label",
        tgt2, "vec_id", "embedding", "label",
        k = 2, nprobe = 2, marginThreshold = 0.0)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(ivf == brute)
    // nprobe=1: every nomination's target shares the query's best
    // cluster — cross-cluster sims never score
    val pruned = Bitext.minePairsIvf(src2, "vec_id", "embedding", "label",
        tgt2, "vec_id", "embedding", "label",
        k = 2, nprobe = 1, marginThreshold = 0.0)
      .as[(Long, Long, Double, Double)].collect()
    assert(pruned.nonEmpty)
    assert(pruned.forall { case (s, t, _, _) =>
      (s < 5) == (t < 5) }) // cluster 0 ids: src 2,4 / tgt 1,3
  }

  test("candidates are the forward/backward top-1 union: a target " +
      "nobody nominates forward still enters via its own nomination") {
    // one source, two targets: only 11 wins forward; 13 enters backward
    val out = Bitext.minePairs(
        src.filter($"vec_id" === 1L), "vec_id", "embedding",
        tgt.filter($"vec_id".isin(11L, 13L)), "vec_id", "embedding",
        k = 2, marginThreshold = 0.0)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(out == Set((1L, 11L), (1L, 13L)))
  }
}
