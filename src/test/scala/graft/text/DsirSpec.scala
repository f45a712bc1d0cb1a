package graft.text

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val raw = Seq(
    (1L, "the cat sat on mat"),
    (2L, "the cat ate the fish"),
    (3L, "stock prices fell sharply today"),
    (4L, "stock markets fell again today"),
    (5L, "one"), // single token: no bigrams, must drop out
    (6L, "the cat sat on mat")) // exact dup of 1: identical score
    .toDF("doc_id", "text")

  test("target-like documents outrank off-target documents") {
    // small bucket count so the fixture's counts dominate the add-one
    // smoothing floor (at B = 4096 a 10-bigram target is pure noise)
    val target = (0 until 3).flatMap(i => Seq(
      (100L + 2 * i, "the cat sat near fish"),
      (101L + 2 * i, "a cat sat on mat"))).toDF("doc_id", "text")
    val scores = Dsir.importanceWeights(raw, target, "doc_id", "text",
      buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 1's bigrams appear verbatim in the target; the finance docs
    // share none of theirs
    assert(scores(1L) > scores(3L) && scores(1L) > scores(4L))
    assert(!scores.contains(5L), "a 1-token doc has no bigrams")
    assert(scores(1L) == scores(6L), "identical text, identical weight")
  }

  test("n_bigrams counts tokens-1 per doc; weights are run-deterministic") {
    val target = raw.where($"doc_id" <= 2L)
    val a = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a.find(_._1 == 1L).get._2 == 4L) // 5 tokens -> 4 bigrams
    val b = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("empty target degrades to the smoothing floor instead of failing") {
    val target = raw.where($"doc_id" < 0L)
    val out = Dsir.importanceWeights(raw, target, "doc_id", "text").collect()
    assert(out.length == 5) // all but the 1-token doc
    // with ct = 0 everywhere the ratio is ln(1/B') - ln(p_r) < 0 for any
    // bucket a doc actually contains (its own count makes p_r > 1/B')
    assert(out.forall(_.getDouble(2) < 0.0))
  }
}
