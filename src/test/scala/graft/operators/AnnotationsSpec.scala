package graft.operators

import graft.SparkSpec

class AnnotationsSpec extends SparkSpec {
  import spark.implicits._

  private def vote(rows: Seq[(Long, String)]) =
    Annotations.majorityVote(rows.toDF("item", "lab"), "item", "lab")
      .as[(Long, String, Long, Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap

  test("majority wins; agreement and unanimity are reported") {
    val r = vote(Seq(
      (1L, "good"), (1L, "good"), (1L, "bad"),
      (2L, "ok"), (2L, "ok"), (2L, "ok")))
    assert(r(1L) == ((1L, "good", 3L, 2L, 0.6667, false)))
    assert(r(2L) == ((2L, "ok", 3L, 3L, 1.0, true)))
  }

  test("a modal tie breaks to the lexicographically lower label") {
    val r = vote(Seq((1L, "b"), (1L, "a"), (1L, "b"), (1L, "a")))
    assert(r(1L)._2 == "a")
    assert(r(1L)._5 == 0.5)
  }

  test("single annotation is unanimous by definition") {
    val r = vote(Seq((7L, "x")))
    assert(r(7L) == ((7L, "x", 1L, 1L, 1.0, true)))
  }
}
