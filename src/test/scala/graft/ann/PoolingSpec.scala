package graft.ann

import graft.SparkSpec

class PoolingSpec extends SparkSpec {
  import spark.implicits._

  test("mean pool computes the elementwise mean with the quantizer") {
    val chunks = Seq(
      (1L, Seq(1.0, 2.0)), (1L, Seq(3.0, 6.0)),
      (2L, Seq(-1.5, 0.5))).toDF("grp", "embedding")
    val out = Pooling.meanPool(chunks, "grp", "embedding")
      .as[(Long, Seq[Double], Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, Seq(2.0, 4.0), 2L)))
    assert(out(2L) == ((2L, Seq(-1.5, 0.5), 1L)))
  }

  test("the quantizer is sign-stable (floor(x*1e6+0.5), both engines' " +
      "formula, not round-half-away)") {
    val chunks = Seq(
      (1L, Seq(0.0000015)), (1L, Seq(0.0000015)),
      (2L, Seq(-0.0000015)), (2L, Seq(-0.0000015)))
      .toDF("grp", "embedding")
    val out = Pooling.meanPool(chunks, "grp", "embedding")
      .as[(Long, Seq[Double], Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out(1L) == Seq(0.000002))  // 1.5e-6 rounds up
    assert(out(2L) == Seq(-0.000001)) // -1.5e-6 floors toward -1e-6
  }

  test("result is partitioning-independent") {
    val chunks = (1L to 200L)
      .map(i => (i % 7, Seq(i * 0.1, i * -0.25, 3.0)))
      .toDF("grp", "embedding")
    val a = Pooling.meanPool(chunks, "grp", "embedding")
      .as[(Long, Seq[Double], Long)].collect().toSet
    val b = Pooling.meanPool(chunks.repartition(13), "grp", "embedding")
      .as[(Long, Seq[Double], Long)].collect().toSet
    assert(a == b && a.size == 7)
  }

  test("ragged embedding dimensions fail loudly, not silently") {
    val bad = Seq((1L, Seq(1.0, 2.0)), (1L, Seq(1.0))).toDF("grp", "embedding")
    val e = intercept[Exception] {
      Pooling.meanPool(bad, "grp", "embedding").collect()
    }
    assert(e.getMessage != null)
  }
}
