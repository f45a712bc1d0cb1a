package graft.dedup

import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("components merge transitively and keep singletons from the " +
      "node universe") {
    // 1-2-3 chained (no direct 1-3 edge), 4-5, 6 isolated, 7 singleton
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val out = Clusters.connectedComponents(edges, "id1", "id2",
        nodes = Some(nodes), idCol = "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 7L))
  }

  test("a long path converges (diameter bound, not one hop)") {
    // path 10-11-12-...-20: diameter 10, forces multiple rounds
    val edges = (10L until 20L).map(i => (i, i + 1)).toDF("id1", "id2")
    val out = Clusters.connectedComponents(edges, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == (10L to 20L).toSet)
    assert(out.values.forall(_ == 10L))
  }

  test("without an explicit node universe only endpoints appear") {
    val edges = Seq((1L, 2L)).toDF("id1", "id2")
    val out = Clusters.connectedComponents(edges, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("iteration budget failure is explicit") {
    val edges = (0L until 30L).map(i => (i, i + 1)).toDF("id1", "id2")
    val e = intercept[IllegalArgumentException] {
      Clusters.connectedComponents(edges, "id1", "id2", maxIter = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
