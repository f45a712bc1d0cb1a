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

  test("btCalibration: predicted buckets from published ratings, " +
      "game-weighted means, empirical fractions from the lower player") {
    // one matchup after iters=1: r = (1.5, 0.5); p(1 beats 2) = 0.75,
    // empirical = 3/4 -> a perfectly calibrated bucket 7
    val pairs = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L))
      .toDF("w", "l")
    val out = Rating.btCalibration(pairs, "w", "l", iters = 1,
        buckets = 10)
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(out.toSeq == Seq((7, 1L, 4L, 0.75, 0.75)))
    // an intransitive rock-paper-scissors log: every rating ties, so
    // every matchup predicts 0.5 while the empirical rates are 1 or 0
    // in each orientation fold — the diagram exposes the misfit
    val rps = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("w", "l")
    val cal = Rating.btCalibration(rps, "w", "l", iters = 3,
        buckets = 10)
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(cal.length == 1 && cal.head._1 == 5)
    assert(cal.head._4 == 0.5)
    assert(cal.head._5 != 0.5 || cal.head._3 == 3L) // folded empirics
  }
}
