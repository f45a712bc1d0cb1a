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

  private def kappa(rows: Seq[(Long, String)]) =
    Annotations.fleissKappa(rows.toDF("item", "lab"), "item", "lab")
      .as[(Long, Long, Long, Double, Double, Double)]
      .collect().head

  test("fleiss kappa matches the hand-computed textbook arithmetic") {
    // 2 items x 3 raters: item 1 = (good, good, bad), item 2 unanimous ok.
    // P_1 = (4+1-3)/6 = 1/3, P_2 = 1 -> p_bar = 2/3
    // marginals: good 2/6, bad 1/6, ok 3/6 -> p_e = (4+1+9)/36 = 7/18
    // kappa = (2/3 - 7/18) / (1 - 7/18) = (5/18)/(11/18) = 5/11
    val (nItems, nRatings, nCats, pBar, pE, k) = kappa(Seq(
      (1L, "good"), (1L, "good"), (1L, "bad"),
      (2L, "ok"), (2L, "ok"), (2L, "ok")))
    assert((nItems, nRatings, nCats) == ((2L, 6L, 3L)))
    assert(pBar == 0.666667 && pE == 0.388889)
    assert(math.abs(k - 5.0 / 11.0) < 1e-6)
  }

  test("perfect agreement gives kappa 1; items with <2 ratings drop") {
    // the (9, x) singleton must not leak into the marginals either:
    // included it would give p_e = (4+4+1)/25 = 0.36 instead of 0.5
    val (nItems, nRatings, _, pBar, pE, k) = kappa(Seq(
      (1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"), (9L, "x")))
    assert(nItems == 2L && nRatings == 4L)
    assert(pBar == 1.0 && pE == 0.5 && k == 1.0)
  }

  test("unequal rating counts use each item's own n_i") {
    // item 1: 2 raters split -> P_1 = 0; item 2: 3 raters unanimous -> 1
    val (nItems, nRatings, _, pBar, _, _) = kappa(Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "a"), (2L, "a")))
    assert(nItems == 2L && nRatings == 5L)
    assert(pBar == 0.5)
  }
}
