package graft.operators

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 200L).map(i => (i, (i % 37).toDouble))
    .toDF("id", "v")

  test("bootstrapCI is deterministic and brackets the mean") {
    val a = Resample.bootstrapCI(rows, "id", "v", reps = 40)
      .as[(Long, Double, Double, Double)].collect().head
    val b = Resample.bootstrapCI(rows, "id", "v", reps = 40)
      .as[(Long, Double, Double, Double)].collect().head
    assert(a == b)                        // hash coins, not RNG
    val (nReps, mean, lo, hi) = a
    assert(nReps == 40L)
    assert(lo <= mean && mean <= hi)
    // half-samples of a bounded population: CI must sit near the
    // population mean (18ish for i % 37 over 200 ids), not at an edge
    assert(lo > 10.0 && hi < 26.0)
  }

  test("a constant column collapses the interval to a point") {
    val const = (1L to 50L).map(i => (i, 3.5)).toDF("id", "v")
    val (_, mean, lo, hi) = Resample.bootstrapCI(const, "id", "v", 20)
      .as[(Long, Double, Double, Double)].collect().head
    assert(mean == 3.5 && lo == 3.5 && hi == 3.5)
  }
}
