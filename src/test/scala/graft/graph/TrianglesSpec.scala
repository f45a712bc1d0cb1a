package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("K4 + pendant: every clique node sits in 3 triangles, the " +
      "pendant in 0; duplicates, reversals, and self-loops canonicalize") {
    val edges = Seq(
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), // K4
      (2, 1), (3, 1),                                  // reversals
      (1, 2), (1, 2),                                  // duplicates
      (3, 3),                                          // self-loop
      (4, 5))                                          // pendant node 5
      .toDF("s", "d")
    val out = Triangles.perNode(edges, "s", "d")
      .as[(Int, Long)].collect().toMap
    assert(out == Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L, 5 -> 0L))
  }

  test("degree-ordered enumeration matches the canonical a<b<c triple " +
      "join on a skewed pseudo-random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40), rnd.nextInt(40)))
      .toDF("s", "d")
    val got = Triangles.perNode(edges, "s", "d")
      .as[(Int, Long)].collect().toMap
    // reference: brute canonical triple join
    val e = edges
      .select(least($"s", $"d").as("u"), greatest($"s", $"d").as("v"))
      .where($"u" =!= $"v").distinct()
    val tr = e.as("e1")
      .join(e.as("e2"), col("e2.u") === col("e1.v"))
      .join(e.as("e3"), col("e3.u") === col("e1.u") &&
        col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"),
        col("e2.v").as("c"))
    val want = tr.select(explode(array($"a", $"b", $"c")).as("n"))
      .groupBy($"n").count()
      .as[(Int, Long)].collect().toMap
    assert(want.nonEmpty) // the fixture actually has triangles
    assert(got.filter(_._2 > 0L) == want)
    // and every graph node reports, zero-triangle nodes included
    val nodes = e.select($"u").unionAll(e.select($"v"))
      .distinct().count()
    assert(got.size == nodes)
  }
}
