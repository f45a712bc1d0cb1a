package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChatSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    (1L, 0L, "user", "hi"),
    (1L, 1L, "assistant", "hello"),
    (1L, 2L, "user", "more?"),
    (1L, 3L, "assistant", "sure"),
    (2L, 0L, "user", "lonely"))
    .toDF("conv", "i", "role", "txt")

  test("renderWithLossSpans: spans slice exactly the assistant text out " +
      "of the rendered conversation") {
    val out = Chat.renderWithLossSpans(turns, "conv", "i", "role", "txt")
      .as[(Long, String, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(r => (r._1, r._3.getOrElse(-1L)))
    val c1 = out.filter(_._1 == 1L)
    assert(c1.length == 2)
    val text = c1.head._2
    assert(text ==
      "<|user|>hi<|end|><|assistant|>hello<|end|>" +
        "<|user|>more?<|end|><|assistant|>sure<|end|>")
    c1.foreach { case (_, t, _, Some(s), Some(e)) =>
      val sliced = t.substring(s.toInt, e.toInt)
      assert(sliced == "hello" || sliced == "sure", sliced)
    }
    assert(c1.map(r => text.substring(r._4.get.toInt, r._5.get.toInt))
      .toSeq == Seq("hello", "sure"))
    // assistant-free conversation: text present, span null
    val c2 = out.filter(_._1 == 2L)
    assert(c2.length == 1 && c2.head._2 == "<|user|>lonely<|end|>" &&
      c2.head._3.isEmpty)
  }

  test("duplicate turn indexes keep spans aligned with the assembled " +
      "text (offset and assembly share one tie order)") {
    val dup = Seq(
      (1L, 0L, "user", "zz"), (1L, 1L, "assistant", "bbb"),
      (1L, 1L, "assistant", "aaaa"), (1L, 2L, "user", "k"))
      .toDF("conv", "i", "role", "txt")
    val out = Chat.renderWithLossSpans(dup, "conv", "i", "role", "txt")
      .as[(Long, String, Option[Long], Option[Long], Option[Long])]
      .collect()
    assert(out.length == 2)
    val sliced = out.map(r =>
      r._2.substring(r._4.get.toInt, r._5.get.toInt)).toSet
    assert(sliced == Set("aaaa", "bbb"), sliced)
  }

  test("alternationAudit flags exactly the planted defects") {
    val bad = Seq(
      (1L, 0L, "user"), (1L, 1L, "assistant"),          // clean
      (2L, 0L, "assistant"), (2L, 1L, "user"),          // bad opening + no... has assistant
      (3L, 0L, "user"), (3L, 1L, "user"), (3L, 2L, "assistant"), // repeat
      (4L, 0L, "user"), (4L, 2L, "assistant"),          // index gap
      (5L, 0L, "user"), (5L, 1L, "user"))               // repeat + no assistant
      .toDF("conv", "i", "role")
    val m = Chat.alternationAudit(bad, "conv", "i", "role")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(m(1L) == ((false, false, false, false)))
    assert(m(2L) == ((true, false, false, false)))
    assert(m(3L) == ((false, true, false, false)))
    assert(m(4L) == ((false, false, false, true)))
    assert(m(5L) == ((false, true, true, false)))
  }
}
