package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val held = Seq(
    (100L, "the quick brown fox jumps over the lazy dog tonight")
  ).toDF("id", "text")

  test("verbatim n-gram leakage is flagged with the overlap count") {
    val train = Seq(
      // contains "the quick brown fox jumps" (n=5) verbatim
      (1L, "witness the quick brown fox jumps over nothing"),
      // no 5-gram in common
      (2L, "completely unrelated words in this training document here"),
      // shorter than n → zero n-grams, reports 0
      (3L, "too short")
    ).toDF("id", "text")
    val rows = Dedup.ngramContamination(train, held, "id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(rows == Set((1L, 2L, true), (2L, 0L, false), (3L, 0L, false)))
  }

  test("every train row appears exactly once, contaminated or not") {
    val train = (1L to 20L).map(i => (i, s"doc $i words unique to it only")).toDF("id", "text")
    val out = Dedup.ngramContamination(train, held, "id", "text", n = 5)
    assert(out.count() == 20L)
    assert(out.where(col("contaminated")).count() == 0L)
  }

  test("overlap counts distinct grams, not occurrences") {
    val train = Seq(
      // the leaked 3-gram "a b c" occurs twice but counts once
      (1L, "a b c x a b c")
    ).toDF("id", "text")
    val h = Seq((9L, "a b c")).toDF("id", "text")
    val got = Dedup.ngramContamination(train, h, "id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq((1L, 1L, true)))
  }

  test("broadcastHeld produces identical results") {
    val train = Seq(
      (1L, "witness the quick brown fox jumps over nothing"),
      (2L, "completely unrelated words in this training document here")
    ).toDF("id", "text")
    val a = Dedup.ngramContamination(train, held, "id", "text", n = 5,
      broadcastHeld = false).orderBy("id").collect().toSeq
    val b = Dedup.ngramContamination(train, held, "id", "text", n = 5,
      broadcastHeld = true).orderBy("id").collect().toSeq
    assert(a == b)
  }
}
