package graft.graph

import graft.SparkSpec

class TreePathsSpec extends SparkSpec {
  import spark.implicits._

  private def paths(rows: Seq[(Long, Option[Long])]) =
    TreePaths.rootPaths(rows.toDF("id", "parent"), "id", "parent")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap

  test("a branching conversation linearizes to root-to-node paths") {
    //        0
    //      /   \
    //     1     2      (two regenerated replies)
    //    / \     \
    //   3   4     5
    //             |
    //             6
    val out = paths(Seq(
      (0L, None), (1L, Some(0L)), (2L, Some(0L)), (3L, Some(1L)),
      (4L, Some(1L)), (5L, Some(2L)), (6L, Some(5L))))
    assert(out(0L) == ((0L, 0L, 0L, "0")))
    assert(out(3L) == ((3L, 0L, 2L, "0/1/3")))
    assert(out(4L) == ((4L, 0L, 2L, "0/1/4")))
    assert(out(6L) == ((6L, 0L, 3L, "0/2/5/6")))
  }

  test("a deep chain resolves in logarithmic rounds (depth 40 well " +
      "past one doubling)") {
    val chain = (0L until 41L)
      .map(i => (i, if (i == 0) None else Some(i - 1)))
    val out = paths(chain)
    assert(out(40L)._3 == 40L)
    assert(out(40L)._4 == (0L to 40L).mkString("/"))
    assert(out(20L)._2 == 0L && out(20L)._3 == 20L)
  }

  test("a forest keeps each tree's own root") {
    val out = paths(Seq(
      (1L, None), (2L, Some(1L)), (10L, None), (11L, Some(10L)),
      (12L, Some(11L))))
    assert(out(2L)._2 == 1L && out(12L)._2 == 10L)
    assert(out(12L)._4 == "10/11/12")
  }

  test("a cycle fails loudly instead of looping") {
    val e = intercept[IllegalStateException] {
      paths(Seq((1L, Some(2L)), (2L, Some(1L)), (3L, None)))
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("a dangling parent reference fails rather than truncating") {
    val e = intercept[IllegalStateException] {
      paths(Seq((1L, None), (2L, Some(99L))))
    }
    assert(e.getMessage.contains("dangling"))
  }

  test("a duplicate node id fails rather than fanning out the join") {
    val e = intercept[IllegalStateException] {
      paths(Seq((1L, None), (2L, Some(1L)), (2L, Some(1L)),
        (3L, Some(2L))))
    }
    assert(e.getMessage.contains("duplicate"))
  }
}
