package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the unigram-LM tokenizer (Kudo 2018) the way BpeSpec pins BPE:
  * a hand-derived golden EM sequence, seeding statistics, Viterbi
  * segmentation, driver/distributed training parity, and the
  * prune-keeps-characters coverage floor.
  *
  * Golden fixture: corpus = the single word "aa", maxPieceLen 2.
  * Seed counts (positioned substrings): a×2, aa×1 → p(a)=2/3, p(aa)=1/3.
  * Segmentations of "aa": [a,a] mass 4/9, [aa] mass 3/9, Z = 7/9.
  * EM1 expected counts: E[a] = 2·(4/9)/(7/9) = 8/7, E[aa] = 3/7
  *   → p(a) = 8/11, p(aa) = 3/11.
  * EM2: masses 64/121 vs 33/121, Z = 97/121; E[a] = 128/97,
  *   E[aa] = 33/97 → p(a) = 128/161, p(aa) = 33/161.
  * Every number below is one of those rationals.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-7

  test("substrings enumerate positioned pieces up to maxLen") {
    assert(UnigramLm.substrings("abc", 2).toSeq ==
      Seq("a", "ab", "b", "bc", "c"))
    assert(UnigramLm.substrings("aa", 2).toSeq == Seq("a", "aa", "a"))
  }

  test("expectedCounts on the golden lattice: soft counts and loglik") {
    val logp = Map("a" -> math.log(2.0 / 3), "aa" -> math.log(1.0 / 3))
    val (e, ll) = UnigramLm.expectedCounts("aa", logp, maxLen = 2)
    assert(math.abs(e("a") - 8.0 / 7) < eps)
    assert(math.abs(e("aa") - 3.0 / 7) < eps)
    assert(math.abs(ll - math.log(7.0 / 9)) < eps)
    // unknown character: no path, empty contribution
    assert(UnigramLm.expectedCounts("xz", Map("a" -> 0.0), 2)._1.isEmpty)
  }

  test("emStep reproduces the golden EM sequence (two steps)") {
    val words = Seq(("aa", 1L))
    val seed = Map("a" -> math.log(2.0 / 3), "aa" -> math.log(1.0 / 3))
    val em1 = UnigramLm.emStep(words, seed, maxLen = 2)
    assert(math.abs(em1("a") - math.log(8.0 / 11)) < eps)
    assert(math.abs(em1("aa") - math.log(3.0 / 11)) < eps)
    val em2 = UnigramLm.emStep(words, em1, maxLen = 2)
    assert(math.abs(em2("a") - math.log(128.0 / 161)) < eps)
    assert(math.abs(em2("aa") - math.log(33.0 / 161)) < eps)
  }

  test("train end-to-end on the golden corpus = seed + one final EM pass") {
    val docs = Seq((1L, "aa")).toDF("doc_id", "text")
    // vocab {a, aa} already <= vocabSize → no prune rounds; the final
    // EM pass lands exactly on the EM1 golden numbers
    val model = UnigramLm.train(docs, "text", vocabSize = 2,
      maxPieceLen = 2).toMap
    assert(model.keySet == Set("a", "aa"))
    assert(math.abs(model("a") - math.log(8.0 / 11)) < eps)
    assert(math.abs(model("aa") - math.log(3.0 / 11)) < eps)
  }

  test("seedStats: deterministic top-k positioned-substring counts") {
    val docs = Seq((1L, "ab ab"), (2L, "Ab  cd")).toDF("doc_id", "text")
    val out = UnigramLm.seedStats(docs, "text", maxLen = 2, k = 10)
      .as[(String, Long)].collect().toSeq
    // words: ab×3, cd×1 → a:3 ab:3 b:3 then c/cd/d:1; ties break lex
    assert(out == Seq(("a", 3L), ("ab", 3L), ("b", 3L),
      ("c", 1L), ("cd", 1L), ("d", 1L)))
  }

  test("train prunes to the target but never below the char floor; " +
      "probabilities sum to 1; reruns are identical") {
    val docs = Seq((1L, "abab abab cdcd"), (2L, "abab efef"))
      .toDF("doc_id", "text")
    val model = UnigramLm.train(docs, "text", vocabSize = 8,
      maxPieceLen = 3, emIters = 1)
    assert(model.size <= 8)
    val pieces = model.map(_._1).toSet
    // coverage floor: every character survives pruning
    assert(Set("a", "b", "c", "d", "e", "f").subsetOf(pieces))
    val mass = model.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(mass - 1.0) < 1e-6)
    val again = UnigramLm.train(docs, "text", vocabSize = 8,
      maxPieceLen = 3, emIters = 1)
    assert(again == model)
    // a vocabSize below the char floor stops at the floor, not forever
    val floor = UnigramLm.train(docs, "text", vocabSize = 2,
      maxPieceLen = 3, emIters = 1)
    assert(floor.map(_._1).toSet == Set("a", "b", "c", "d", "e", "f"))
  }

  test("driver and distributed training agree (the kmeans parity bar)") {
    val docs = Seq((1L, "abab abab cdcd"), (2L, "abab efef baba"))
      .toDF("doc_id", "text")
    val inMem = UnigramLm.train(docs, "text", vocabSize = 8,
      maxPieceLen = 3, emIters = 1)
    // budget 0 forces the distributed loop on the same corpus
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val dist = UnigramLm.train(docs, "text", vocabSize = 8,
      maxPieceLen = 3, emIters = 1, driverVocabBudget = 0)
    assert(dist == inMem)
    // the loop sized its shuffles to the word table, then restored
    assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore)
  }

  test("viterbi: max-probability split, longer-piece tie-break, " +
      "unknown chars pass through") {
    // p(ab) dominates: "abab" → [ab, ab], not four singletons
    val m = Map("a" -> math.log(0.1), "b" -> math.log(0.1),
      "ab" -> math.log(0.4))
    assert(UnigramLm.viterbi("abab", m, 2) == Vector("ab", "ab"))
    // exact tie p(aa) = p(a)^2: longer piece wins
    val tie = Map("a" -> math.log(0.5), "aa" -> math.log(0.25))
    assert(UnigramLm.viterbi("aa", tie, 2) == Vector("aa"))
    // unknown char: singleton passthrough, neighbors still greedy
    assert(UnigramLm.viterbi("axb", m, 2) == Vector("a", "x", "b"))
    assert(UnigramLm.viterbi("", m, 2) == Vector.empty)
  }

  test("save/load round-trips the model in training order and the " +
      "reloaded artifact encodes identically") {
    val docs = Seq((1L, "abab abab cdcd")).toDF("doc_id", "text")
    val model = UnigramLm.train(docs, "text", vocabSize = 6,
      maxPieceLen = 2, emIters = 1)
    val tmp = graft.EntryKit.scratchTracked("graft_unigram").toString
    UnigramLm.save(spark, model, tmp)
    val back = UnigramLm.load(spark, tmp)
    assert(back == model)
    val enc = UnigramLm.encodeTokens(docs, "doc_id", "text", model, 2)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val encBack = UnigramLm.encodeTokens(docs, "doc_id", "text", back, 2)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(encBack == enc)
  }

  test("encodeTokens: lossless concatenation, counts match") {
    val docs = Seq((1L, "abab cd"), (2L, "")).toDF("doc_id", "text")
    val model = UnigramLm.train(docs, "text", vocabSize = 10,
      maxPieceLen = 2, emIters = 1)
    val out = UnigramLm.encodeTokens(docs, "doc_id", "text", model,
        maxPieceLen = 2)
      .as[(Long, Seq[String], Int)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2.mkString == "ababcd")
    assert(out(1L)._3 == out(1L)._2.length)
    assert(out(2L)._2.isEmpty && out(2L)._3 == 0)
  }
}
