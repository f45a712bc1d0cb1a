package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "clear useful prose with substance and clear structure", true),
    (2L, "useful clear substance structure prose", true),
    (3L, "spam spam buy buy cheap cheap now now", false),
    (4L, "buy cheap spam now buy cheap", false),
    (5L, "clear prose with substance", true),
    (6L, "spam cheap buy now spam", false))
    .toDF("id", "text", "good")

  test("three GD iterations separate an obviously separable corpus") {
    val scored = QualityModel.trainAndScore(
        docs, "id", "text", col("good"), buckets = 64)
      .join(docs.select(col("id"), col("good")), "id")
      .as[(Long, Double, Boolean, Boolean)].collect()
    assert(scored.length == 6)
    scored.foreach { case (id, prob, predicted, good) =>
      assert(predicted == good, s"doc $id: prob $prob")
      assert(if (good) prob > 0.5 else prob < 0.5)
    }
  }

  test("training is deterministic across runs") {
    val m1 = QualityModel.fit(docs, "id", "text", col("good"))
    val m2 = QualityModel.fit(docs, "id", "text", col("good"))
    assert(m1 == m2)
    assert(m1.contains(-1L)) // bias always present
    assert(m1.size <= 65)    // buckets + bias — the driver-state budget
  }

  test("unseen tokens fall back to zero weight; the bias still scores " +
      "the doc") {
    val model = QualityModel.fit(docs, "id", "text", col("good"))
    val unseen = Seq((9L, "entirely novel vocabulary here")).toDF("id", "text")
    val out = QualityModel.score(unseen, "id", "text", model, buckets = 64)
      .as[(Long, Double, Boolean)].collect()
    assert(out.length == 1)
    // all-unseen features ⇒ margin reduces to the bias weight alone
    val bias = model(-1L)
    val expected = BigDecimal(1.0 / (1.0 + math.exp(-BigDecimal(bias)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head._2 == expected)
  }

  test("more iterations move the separable corpus further from 0.5") {
    def gap(iters: Int): Double = {
      val s = QualityModel.trainAndScore(
          docs, "id", "text", col("good"), iters = iters)
        .as[(Long, Double, Boolean)].collect()
      s.map(r => math.abs(r._2 - 0.5)).min
    }
    assert(gap(5) > gap(1))
  }

  test("zero-token docs drop from training and scoring") {
    val withEmpty = docs.union(Seq((7L, "", true)).toDF("id", "text", "good"))
    val scored = QualityModel.trainAndScore(
      withEmpty, "id", "text", col("good"))
    assert(scored.count() == 6)
    assert(scored.where(col("id") === 7L).isEmpty)
  }
}
