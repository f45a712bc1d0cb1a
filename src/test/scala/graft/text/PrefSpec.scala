package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row

class PrefSpec extends SparkSpec {
  import spark.implicits._

  // prompt 1: clean pool (margin 8, unique top)
  // prompt 2: zero-margin pool (all scores equal)
  // prompt 3: single candidate
  // prompt 4: top tie broken by resp_id, sub-threshold margin
  // prompt 5: identical chosen/rejected text (degenerate)
  private val resp = Seq(
    (1L, 0L, "short", 2.0), (1L, 1L, "a long answer", 10.0),
    (1L, 2L, "mid", 5.0),
    (2L, 0L, "x", 4.0), (2L, 1L, "y", 4.0),
    (3L, 0L, "alone", 7.0),
    (4L, 0L, "p", 6.0), (4L, 1L, "q", 6.0), (4L, 2L, "r", 5.0),
    (5L, 0L, "same", 1.0), (5L, 1L, "same", 9.0))
    .toDF("prompt", "rid", "txt", "sc")

  test("preferencePairs: extremes, tie-breaks, and every filter") {
    val out = Pref.preferencePairs(resp, "prompt", "rid", "txt", "sc",
        minMargin = 2.0)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    // prompt 1 survives: chosen rid=1 (10.0), rejected rid=0 (2.0)
    // prompt 2 dies (margin 0), 3 dies (n=1), 4 dies (margin 1 < 2),
    // prompt 5 dies (identical text despite margin 8)
    assert(out.toSeq == Seq((1L, 1L, 0L, 3L, 8.0)))
    // lowering the margin bar admits prompt 4, whose chosen is the
    // HIGHER resp_id among the 6.0 tie
    val loose = Pref.preferencePairs(resp, "prompt", "rid", "txt", "sc",
        minMargin = 0.5)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(loose.toSeq == Seq((1L, 1L, 0L, 3L, 8.0), (4L, 1L, 2L, 3L, 1.0)))
  }

  test("pairAudit: each defect flag fires on exactly its planted prompt") {
    val out = Pref.pairAudit(resp, "prompt", "rid", "txt", "sc")
      .collect().map { case Row(p: Long, n: Long, few: Boolean,
        zm: Boolean, dg: Boolean, ties: Long) => (p, n, few, zm, dg, ties) }
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 3L, false, false, false, 1L),
      (2L, 2L, false, true, false, 2L),
      (3L, 1L, true, true, true, 1L),
      (4L, 3L, false, false, false, 2L),
      (5L, 2L, false, false, true, 1L)))
  }

  test("bestOfN: top candidate per pool with the (score, resp_id) " +
      "tie-break and the pool size it won over") {
    val out = Pref.bestOfN(resp, "prompt", "rid", "sc")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, 10.0, 3L),
      (2L, 1L, 4.0, 2L),  // tie at 4.0 -> higher resp_id wins
      (3L, 0L, 7.0, 1L),
      (4L, 1L, 6.0, 3L),  // tie at 6.0 -> rid 1 over rid 0
      (5L, 1L, 9.0, 2L)))
  }

  test("preferencePairs is deterministic under reshuffled input order") {
    val shuffled = resp.orderBy($"sc".desc, $"rid".asc)
    val a = Pref.preferencePairs(resp, "prompt", "rid", "txt", "sc", 0.5)
      .collect().toSet
    val b = Pref.preferencePairs(shuffled, "prompt", "rid", "txt", "sc", 0.5)
      .collect().toSet
    assert(a == b)
  }

  test("lengthBias: buckets by token delta over the SAME surviving " +
      "pairs as preferencePairs, with shares summing to 1") {
    // minMargin 0.5 admits prompts 1 and 4 (see above):
    //   prompt 1: chosen "a long answer" (3 tok) vs "short" (1) -> +2
    //   prompt 4: chosen "q" (1 tok) vs "r" (1 tok) -> equal
    val out = Pref.lengthBias(resp, "prompt", "rid", "txt", "sc",
        minMargin = 0.5)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set("chosen_longer", "equal_length"))
    assert(out("chosen_longer") ==
      (("chosen_longer", 1L, 0.5, 2.0, 8.0)))
    assert(out("equal_length") ==
      (("equal_length", 1L, 0.5, 0.0, 1.0)))
    // a rejected-longer pair lands in its own bucket
    val rl = Seq((9L, 0L, "one two three", 1.0), (9L, 1L, "won", 5.0))
      .toDF("prompt", "rid", "txt", "sc")
    val o2 = Pref.lengthBias(rl, "prompt", "rid", "txt", "sc", 0.5)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(o2.toSeq == Seq(("rejected_longer", 1L, 1.0, -2.0, 4.0)))
  }
}
