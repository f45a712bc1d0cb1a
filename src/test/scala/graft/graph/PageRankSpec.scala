package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("a sink fed by everything outranks its feeders; ranks are " +
      "deterministic across runs") {
    // star: a, b, c all point at hub; hub points at a (so no dangling)
    val edges = Seq(("a", "hub"), ("b", "hub"), ("c", "hub"),
      ("hub", "a")).toDF("src", "dst")
    // the hub/a exchange oscillates early (damped by 0.85² per round
    // trip), so compare near the fixpoint: hub ≈ 0.4797 > a ≈ 0.4453
    val out = PageRank.pagerank(edges, "src", "dst", iters = 30)
      .orderBy(col("rank").desc, col("node"))
      .as[(String, Double)].collect().toSeq
    assert(out.head._1 == "hub")
    assert(out(1)._1 == "a") // a gets all of hub's mass
    assert(math.abs(out.head._2 - 0.4797) < 0.005)
    val again = PageRank.pagerank(edges, "src", "dst", iters = 30)
      .orderBy(col("rank").desc, col("node"))
      .as[(String, Double)].collect().toSeq
    assert(out == again)
  }

  test("a regular graph converges to the uniform distribution and " +
      "total mass stays <= 1") {
    // 3-cycle: every node has in/out degree 1
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val out = PageRank.pagerank(edges, "src", "dst", iters = 5)
      .as[(String, Double)].collect().toSeq
    out.foreach { case (_, r) => assert(math.abs(r - 1.0 / 3) < 1e-6) }
    assert(out.map(_._2).sum <= 1.0 + 1e-6)
  }

  test("labelPropagation: two dense cliques joined by one bridge " +
      "resolve to two communities; ties break to the smaller label") {
    // clique {1,2,3}, clique {10,11,12}, bridge 3-10
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (3L, 10L)).toDF("src", "dst")
    val out = PageRank.labelPropagation(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
    // the left clique coalesces on label 1
    assert(Set(1L, 2L, 3L).map(out) == Set(1L))
    // the right clique coalesces on one label, distinct from the left
    val rightLabels = Set(10L, 11L, 12L).map(out)
    assert(rightLabels.size == 1 && !rightLabels.contains(out(1L)))
    // determinism
    val again = PageRank.labelPropagation(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(again == out)
    // a link-less corpus member passed via the node universe keeps a
    // singleton community instead of vanishing from the output
    val withIsolated = PageRank.labelPropagation(edges, "src", "dst",
        iters = 3, nodes = Some(Seq(99L).toDF("doc_id")), idCol = "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(withIsolated(99L) == 99L && withIsolated.size == 7)
    // the documented bipartite oscillation, pinned: a 2-node graph swaps
    // labels every round (odd iters → exchanged, even iters → identity) —
    // the deterministic fixed-schedule contract, not convergence
    val pair = Seq((7L, 8L)).toDF("src", "dst")
    val p1 = PageRank.labelPropagation(pair, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(p1 == Map(7L -> 8L, 8L -> 7L))
    val p2 = PageRank.labelPropagation(pair, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(p2 == Map(7L -> 7L, 8L -> 8L))
  }

  test("hits: star graph — the hub points, the center collects " +
      "authority; scores L2-normalize each round; determinism") {
    // h -> {a, b, c}: h is the pure hub, a/b/c pure authorities
    val star = Seq(("h", "a"), ("h", "b"), ("h", "c")).toDF("src", "dst")
    val out = PageRank.hits(star, "src", "dst", iters = 3)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // authorities: a=b=c = 1/sqrt(3), h = 0; hub: h = 1, leaves 0
    val inv = 1.0 / math.sqrt(3)
    Seq("a", "b", "c").foreach { n =>
      assert(math.abs(out(n)._1 - inv) < 1e-8, s"auth($n)=${out(n)._1}")
      assert(out(n)._2 == 0.0)
    }
    assert(out("h")._1 == 0.0 && math.abs(out("h")._2 - 1.0) < 1e-8)
    // auth and hub vectors are unit-norm
    val a2 = out.values.map(v => v._1 * v._1).sum
    val h2 = out.values.map(v => v._2 * v._2).sum
    assert(math.abs(a2 - 1.0) < 1e-6 && math.abs(h2 - 1.0) < 1e-6)
    val again = PageRank.hits(star, "src", "dst", iters = 3)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(again == out)
  }

  test("one iteration matches the hand-computed damped update") {
    // two nodes: a -> b, b -> a; uniform start 0.5 each
    // r1(x) = 0.15/2 + 0.85 * 0.5 = 0.5 for both
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val out = PageRank.pagerank(edges, "src", "dst", iters = 1)
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(out == Seq(("a", 0.5), ("b", 0.5)))
  }
}
