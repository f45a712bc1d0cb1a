package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al.'s worked example: the corpus is the word-frequency
  // distribution {low:5, lower:2, newest:6, widest:3}
  private def corpus = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    .toDF("text")

  test("train recovers the classic golden merge sequence") {
    val merges = Bpe.train(corpus, "text", numMerges = 6)
    // hand-derived: (e,s) 9 wins its tie lexicographically, then
    // (es,t) 9, (est,</w>) 9, (l,o) 7, (lo,w) 7; round 6 ties at 6
    // between (e,w), (n,e), (w,est</w>) → lex picks (e,w)
    assert(merges.take(5) == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
    assert(merges(5) == (("e", "w")))
  }

  test("greedy encode applies trained ranks: seen words collapse, " +
      "unseen words fall back to character pieces") {
    val merges = Bpe.train(corpus, "text", numMerges = 8)
    val ranks = merges.zipWithIndex.toMap
    // "lowest" never appears in the corpus but its pieces do
    assert(Bpe.encodeWord("lowest", ranks) == Vector("low", "est</w>"))
    assert(Bpe.encodeWord("low", ranks) == Vector("low", "</w>") ||
      Bpe.encodeWord("low", ranks) == Vector("low</w>"))
    // no applicable merges: pure characters + end marker
    assert(Bpe.encodeWord("xyz", Map.empty) ==
      Vector("x", "y", "z", "</w>"))
  }

  test("applyMerge resolves overlapping occurrences leftmost-first") {
    assert(Bpe.applyMerge(Vector("a", "a", "a"), "a", "a") ==
      Vector("aa", "a"))
    assert(Bpe.applyMerge(Vector("a", "b", "a", "b"), "a", "b") ==
      Vector("ab", "ab"))
  }

  test("distributed and driver-side training agree merge-for-merge") {
    val mem = Bpe.train(corpus, "text", numMerges = 8)
    val dist = Bpe.train(corpus, "text", numMerges = 8,
      driverVocabBudget = 0)
    assert(mem == dist && mem.length == 8)
  }

  test("train is deterministic and stops when counts fall below minCount") {
    val m1 = Bpe.train(corpus, "text", numMerges = 20)
    val m2 = Bpe.train(corpus, "text", numMerges = 20)
    assert(m1 == m2)
    // a one-word corpus exhausts quickly: every pair occurs once
    val tiny = Seq("abc").toDF("text")
    assert(Bpe.train(tiny, "text", numMerges = 5).isEmpty)
  }

  test("encodeCounts: subword totals shrink as merges grow, words stay") {
    val docs = Seq((1L, "newest widest low"), (2L, "lower low"))
      .toDF("doc_id", "text")
    val none = Bpe.encodeCounts(docs, "doc_id", "text", Seq.empty)
      .orderBy("doc_id").as[(Long, Int, Long)].collect()
    // zero merges: every word costs len(chars) + 1 subwords
    assert(none(0) == ((1L, 3, ("newestwidestlow".length + 3).toLong)))
    assert(none(1) == ((2L, 2, ("lowerlow".length + 2).toLong)))
    val merges = Bpe.train(corpus, "text", numMerges = 8)
    val trained = Bpe.encodeCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Int, Long)].collect()
    assert(trained(0)._2 == 3 && trained(1)._2 == 2)
    assert(trained(0)._3 < none(0)._3 && trained(1)._3 < none(1)._3)
  }

  test("encodeTokens emits the exact concatenated subword sequence " +
      "and agrees with encodeCounts totals") {
    val merges = Bpe.train(corpus, "text", numMerges = 8)
    val docs = Seq((1L, "lowest newest"), (2L, "xyz")).toDF("doc_id", "text")
    val got = Bpe.encodeTokens(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Seq[String], Int)].collect()
    val ranks = merges.zipWithIndex.toMap
    assert(got(0)._2 ==
      Bpe.encodeWord("lowest", ranks) ++ Bpe.encodeWord("newest", ranks))
    assert(got(1)._2 == Vector("x", "y", "z", "</w>"))
    // token counts match the accounting pass exactly
    val counts = Bpe.encodeCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Int, Long)].collect()
    assert(got.map(r => (r._1, r._3.toLong)).toSeq ==
      counts.map(r => (r._1, r._3)).toSeq)
    // round-trip: concatenating subwords (minus markers) re-spells the text
    assert(got(0)._2.mkString.replace("</w>", " ").trim == "lowest newest")
  }

  test("save/load round-trips the merge list in training order and the " +
      "reloaded artifact encodes identically") {
    val merges = Bpe.train(corpus, "text", numMerges = 8)
    val tmp = graft.EntryKit.scratchTracked("graft_bpe").toString
    Bpe.save(spark, merges, tmp)
    val back = Bpe.load(spark, tmp)
    assert(back == merges)
    val docs = Seq((1L, "lowest newest")).toDF("doc_id", "text")
    assert(
      Bpe.encodeTokens(docs, "doc_id", "text", back)
        .collect().map(_.toSeq).toSeq ==
        Bpe.encodeTokens(docs, "doc_id", "text", merges)
          .collect().map(_.toSeq).toSeq)
  }
}
