package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("bigram scores match a hand-computed add-one model") {
    // corpus: "a b a b" and "a b". V = 2.
    // bigrams: (a,b)x3, (b,a)x1. c(a,.)=3, c(b,.)=1.
    // lp(a,b) = ln(4/5); lp(b,a) = ln(2/3)
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = NgramLm.bigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    val lpAb = BigDecimal(math.log(4.0 / 5.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpBa = BigDecimal(math.log(2.0 / 3.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_._1) == Seq(1L, 2L))
    assert(out(0)._2 == 3L && out(1)._2 == 1L)
    assert(out(0)._3 == r4((2 * lpAb + lpBa) / 3.0))
    assert(out(1)._3 == r4(lpAb))
  }

  test("docs with fewer than two tokens drop out; a repeated corpus " +
      "scores higher than a shuffled-vocabulary one for its own bigrams") {
    val df = Seq((1L, "solo"), (2L, "x y x y x y"), (3L, "p q"))
      .toDF("doc_id", "text")
    val out = NgramLm.bigramLogProb(df, "doc_id", "text")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L, 3L))
    val scores = out.orderBy("doc_id")
      .select("avg_logprob").as[Double].collect()
    // (x,y) occurs 3x of c(x,.)=3 vs (p,q) once of c(p,.)=1: the
    // high-frequency bigram is more probable under the corpus model
    assert(scores(0) > scores(1))
  }

  test("scoring is deterministic across runs") {
    val df = (1 to 50).map(i =>
      (i.toLong, s"w${i % 7} w${i % 5} w${i % 3} w${i % 7}"))
      .toDF("doc_id", "text")
    val a = NgramLm.bigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val b = NgramLm.bigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
  }
}
