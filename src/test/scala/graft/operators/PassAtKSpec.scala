package graft.operators

import graft.SparkSpec

class PassAtKSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Boolean)], k: Int) =
    PassAtK.passAtK(rows.toDF("p", "ok"), "p", "ok", k)
      .as[(Long, Long, Long, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap

  test("pass@2 matches the closed form, clamps, and undefined cases") {
    val rows =
      (1 to 5).map(i => (1L, i <= 2)) ++   // n=5, c=2 -> 1 - 6/20 = 0.7
      (1 to 5).map(i => (2L, false)) ++    // c=0 -> 0
      (1 to 5).map(i => (3L, i <= 4)) ++   // c=4 -> C(1,2)=0 -> 1.0
      Seq((4L, true))                      // n=1 < k -> null
    val out = run(rows, k = 2)
    assert(out(1L) == ((1L, 5L, 2L, 0.4, Some(0.7))))
    assert(out(2L)._5 == Some(0.0) && out(2L)._4 == 0.0)
    assert(out(3L)._5 == Some(1.0))
    assert(out(4L) == ((4L, 1L, 1L, 1.0, None)))
  }

  test("pass@1 equals c/n and k=1 agrees with it") {
    val out = run((1 to 4).map(i => (9L, i == 1)), k = 1)
    // 1 - C(3,1)/C(4,1) = 1 - 3/4 = 0.25 = c/n
    assert(out(9L)._4 == 0.25 && out(9L)._5 == Some(0.25))
  }
}
