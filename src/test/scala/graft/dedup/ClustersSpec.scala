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

  test("leakageSafeSplit: every member of a component shares one split; " +
      "singletons follow the plain component hash-split") {
    // chain 1-2-3 one component; 4-5 another; 6, 7 singletons
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val out = Clusters.leakageSafeSplit(docs, "doc_id", edges)
      .as[(Long, Long, String)].collect()
    assert(out.length == 7)
    // all members of a component carry the identical split label
    val byComp = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byComp.values.forall(_.size == 1))
    // the label is the md5-first-hex-char rule on the component id
    def want(c: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(c.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.charAt(0)
      if (h <= 'b') "train" else if (h <= 'd') "val" else "test"
    }
    out.foreach { case (_, c, s) => assert(s == want(c), s"component $c") }
    // determinism
    val again = Clusters.leakageSafeSplit(docs, "doc_id", edges)
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(again == out.sortBy(_._1).toSeq)
  }

  test("iteration budget failure is explicit") {
    val edges = (0L until 30L).map(i => (i, i + 1)).toDF("id1", "id2")
    val e = intercept[IllegalArgumentException] {
      Clusters.connectedComponents(edges, "id1", "id2", maxIter = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("leakageSafeFolds: clusters land whole in one of k folds via " +
      "the md5-mod rule; every doc appears; folds stay in range") {
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val out = Clusters.leakageSafeFolds(docs, "doc_id", k = 3, edges)
      .as[(Long, Long, Int)].collect()
    assert(out.length == 7)
    assert(out.forall(r => r._3 >= 0 && r._3 < 3))
    val byComp = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byComp.values.forall(_.size == 1))
    def want(c: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(c.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      (java.lang.Long.parseLong(h, 16) % 3).toInt
    }
    out.foreach { case (_, c, f) => assert(f == want(c), s"component $c") }
  }
}
