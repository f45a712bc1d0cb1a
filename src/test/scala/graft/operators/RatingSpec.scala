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

  test("winMatrix: hand-computed Wilson interval, the small-n honesty " +
      "(p=1 never reads [1,1]), and the unresolved straddle flag") {
    // matchup (1,2): 1 wins 3, loses 1 -> p = 0.75
    val pairs = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L),
      (3L, 4L), (3L, 4L), (3L, 4L)) // (3,4): 3-0
      .toDF("w", "l")
    val out = Rating.winMatrix(pairs, "w", "l")
      .as[(Long, Long, Long, Long, Double, Double, Double, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val m12 = out((1L, 2L))
    assert((m12._3, m12._4, m12._5) == ((4L, 3L, 0.75)))
    // Wilson at n=4, p=.75, z=1.96
    val (n, p, z2) = (4.0, 0.75, 1.96 * 1.96)
    val ctr = (p + z2 / (2 * n)) / (1 + z2 / n)
    val hf = 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) /
      (1 + z2 / n)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m12._6 == r4(ctr - hf) && m12._7 == r4(ctr + hf))
    assert(m12._8) // interval straddles 0.5: unresolved at n=4
    // the 3-0 sweep: p_emp 1 but the Wilson upper-only honesty holds
    val m34 = out((3L, 4L))
    assert(m34._5 == 1.0 && m34._6 < 1.0 && m34._7 == 1.0)
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
