package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RatingSpec extends SparkSpec {
  import spark.implicits._

  private def ratings(pairs: Seq[(Long, Long)], iters: Int = 2)
      : Map[Long, Double] =
    Rating.bradleyTerry(pairs.toDF("w", "l"), "w", "l", iters)
      .as[(Long, Double)].collect().toMap

  test("transitive dominance orders the ratings") {
    // a(1) always beats b(2), b always beats c(3): 4 games each edge
    val pairs = Seq.fill(4)((1L, 2L)) ++ Seq.fill(4)((2L, 3L))
    val r = ratings(pairs)
    assert(r(1L) > r(2L) && r(2L) > r(3L))
  }

  test("a winless player rates 0 and an unbeaten one dominates") {
    val r = ratings(Seq((1L, 2L), (1L, 2L), (1L, 3L)))
    assert(r(2L) == 0.0 && r(3L) == 0.0)
    assert(r(1L) > 0.0)
  }

  test("symmetric records rate equally; more iterations preserve the " +
      "order of an asymmetric one") {
    // 1 and 2 split their series 2-2: identical information
    val even = ratings(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 1L)))
    assert(even(1L) == even(2L))
    // 3-1 split: winner ahead at every iteration depth
    for (it <- 1 to 4) {
      val r = ratings(Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L)), it)
      assert(r(1L) > r(2L), s"iters=$it")
    }
  }

  test("MM update matches the hand computation for one iteration") {
    // players 1, 2; 1 beats 2 three times, 2 beats 1 once.
    // r0 = (1, 1); den_i = n_12 / (r_1 + r_2) = 4 / 2 = 2 for both;
    // r1_1 = 3 / 2 = 1.5, r1_2 = 1 / 2 = 0.5
    val r = ratings(Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L)), iters = 1)
    assert(r(1L) == 1.5 && r(2L) == 0.5)
  }
}
