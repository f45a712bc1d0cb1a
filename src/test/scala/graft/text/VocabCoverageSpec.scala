package graft.text

import graft.SparkSpec

class VocabCoverageSpec extends SparkSpec {
  import spark.implicits._

  test("coverage fractions match hand-computed Zipf head") {
    // token counts: the=4, cat=3, sat=2, mat=1 → total 10
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat sat the mat"),
      (3L, "the cat")
    ).toDF("id", "text")
    val got = TextAnalysis.vocabCoverage(docs, "text", Seq(1, 2, 4))
      .orderBy("k")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1, 4L, 10L, 0.4),   // top-1 = "the"
      (2, 7L, 10L, 0.7),   // + "cat"
      (4, 10L, 10L, 1.0))) // whole vocabulary
  }

  test("k larger than the vocabulary still covers everything") {
    val docs = Seq((1L, "a b a")).toDF("id", "text")
    val got = TextAnalysis.vocabCoverage(docs, "text", Seq(100))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((100, 3L, 3L, 1.0)))
  }

  test("frequency ties break lexicographically (deterministic head)") {
    // b=2, a=2, c=1: top-2 must be {a, b} by (freq desc, word asc)
    val docs = Seq((1L, "b a b a c")).toDF("id", "text")
    val got = TextAnalysis.vocabCoverage(docs, "text", Seq(2))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == Seq((2, 4L)))
  }
}
