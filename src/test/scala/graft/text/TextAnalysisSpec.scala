package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("token and subword counting") {
    val r = one("Hello, world! 42 times").select(
      TextAnalysis.tokenCount($"text").as("t"),
      TextAnalysis.subwordCount($"text").cast("int").as("s"))
      .as[(Int, Int)].head()
    assert(r._1 == 4)
    // Hello , world ! 42 times → 6 pieces
    assert(r._2 == 6)
  }

  test("langId picks the marker-dominant language, und on no hits") {
    val df = Seq(
      "the cat of the house and a dog",
      "der hund und die katze ist nicht da",
      "el perro y los gatos que una casa",
      "le chien et les chats dans une maison",
      "xyzzy plugh quux").toDF("text")
      .select(TextAnalysis.langId($"text").as("l"))
    assert(df.as[String].collect().toSeq ==
      Seq("en", "de", "es", "fr", "und"))
  }

  test("quality: clean prose scores higher than punctuation noise") {
    val clean = one("the quick brown fox and the lazy dog in a field of tall grass")
      .select(TextAnalysis.qualityScore($"text")).as[Double].head()
    val noisy = one("@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))")
      .select(TextAnalysis.qualityScore($"text")).as[Double].head()
    assert(clean > noisy)
    assert(clean <= 1.0 && noisy >= 0.0)
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val fps = Seq("Hello   World", "hello world", "hello  world!")
      .toDF("text").select(TextAnalysis.fingerprint($"text"))
      .as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("chunks: overlapping windows cover every token; short and empty " +
      "docs yield exactly one chunk") {
    val words = (1 to 75).map(i => s"w$i")
    val out = Seq(words.mkString(" ")).toDF("text")
      .select(TextAnalysis.chunks($"text", size = 40, overlap = 10))
      .as[Seq[String]].head()
    // 75 tokens, step 30 → ceil(65/30) = 3 chunks: [1,40], [31,70], [61,75]
    assert(out.length == 3)
    assert(out(0) == words.take(40).mkString(" "))
    assert(out(1) == words.slice(30, 70).mkString(" "))
    assert(out(2) == words.slice(60, 75).mkString(" "))
    // consecutive chunks overlap by exactly `overlap` tokens
    assert(out(0).split(" ").takeRight(10).toSeq ==
      out(1).split(" ").take(10).toSeq)
    val one = Seq("only three words", "").toDF("text")
      .select(TextAnalysis.chunks($"text", 40, 10)).as[Seq[String]].collect()
    assert(one(0) == Seq("only three words"))
    assert(one(1).length == 1) // empty doc still yields one (empty) chunk
  }

  test("bm25 ranks term-dense short docs above term-sparse long ones, " +
      "ignores non-query terms, caps at k") {
    val docs = Seq(
      (1L, "vector vector vector"),             // dense in a query term
      (2L, "vector " + ("filler " * 50).trim),  // same term, diluted
      (3L, "hash join scan"),                   // multiple query terms
      (4L, "completely unrelated words here"),  // no query terms → absent
      (5L, "vector hash")).toDF("doc_id", "text")
    val top = TextAnalysis.bm25TopK(
      docs, "doc_id", "text", terms = Seq("vector", "hash"), k = 3)
      .orderBy("rank").collect()
    assert(top.length == 3)
    val ids = top.map(_.getAs[Long]("doc_id")).toSeq
    assert(!ids.contains(4L)) // doc without query terms never scores
    // two query terms beat one diluted term; density beats dilution
    assert(ids.head == 5L || ids.head == 1L)
    val scores = top.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
    val d1 = top.find(_.getAs[Long]("doc_id") == 1L).map(_.getAs[Double]("score"))
    val d2 = TextAnalysis.bm25TopK(
      docs, "doc_id", "text", Seq("vector", "hash"), k = 5)
      .where($"doc_id" === 2L).select("score").as[Double].collect().headOption
    assert(d1.get > d2.get) // dilution by length lowers the score
  }

  test("packSequences conserves docs and tokens, numbers sequences " +
      "contiguously per group, and respects the chunk boundaries") {
    val rnd = new scala.util.Random(5)
    val docs = (0L until 100L)
      .map(i => (i, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" ")))
      .toDF("doc_id", "text")
    val maxTokens = 32
    val packed = TextAnalysis.packSequences(
      docs, "doc_id", "text", maxTokens, groups = 4).collect()
    // conservation: every doc lands in exactly one sequence, all tokens kept
    assert(packed.map(_.getAs[Long]("n_docs")).sum == 100L)
    val totalToks = docs
      .select(TextAnalysis.tokenCount($"text").cast("long")).as[Long]
      .collect().sum
    assert(packed.map(_.getAs[Long]("n_tokens")).sum == totalToks)
    // per group: sequences start at 0 and ascend; an ABSENT seq id is
    // legal (one long doc covered that whole chunk), but the cumulative
    // token stream through each present sequence must reach the next
    // present sequence's chunk start — chunks partition the stream
    packed.groupBy(_.getAs[Long]("grp")).foreach { case (_, rows) =>
      val bySeq = rows.sortBy(_.getAs[Long]("seq"))
      val seqs = bySeq.map(_.getAs[Long]("seq")).toSeq
      assert(seqs.head == 0L && seqs == seqs.distinct.sorted)
      val cums = bySeq.map(_.getAs[Long]("n_tokens")).scanLeft(0L)(_ + _).drop(1)
      seqs.zip(cums).sliding(2).foreach {
        case Seq((_, cum), (nextSeq, _)) =>
          assert(cum >= nextSeq * maxTokens,
            s"token stream fell short of seq $nextSeq's chunk start: $cum")
        case _ =>
      }
    }
    // determinism: a second run packs identically
    val again = TextAnalysis.packSequences(
      docs, "doc_id", "text", maxTokens, groups = 4).collect()
    assert(packed.map(_.toSeq).sortBy(_.toString).toSeq ==
      again.map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("repetitionSignals: mode fraction and duplicate-trigram fraction " +
      "match hand computation; short docs degrade to zero trigram signal") {
    val docs = Seq(
      (1L, "a a a a"), // 4 tokens, trigrams [a a a, a a a] → dup 0.5
      (2L, "a b c d"), // all distinct → top 0.25, dup 0.0
      (3L, "x"), // 1 token: top 1.0, no trigrams
      (4L, "spam spam spam ham spam spam spam")) // 6/7 spam
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Double, Double)].collect().toSeq
    assert(out(0) == ((1L, 4, 1.0, 0.5)))
    assert(out(1) == ((2L, 4, 0.25, 0.0)))
    assert(out(2) == ((3L, 1, 1.0, 0.0)))
    // trigrams of doc 4: 5 total, distinct {s s s, s s h, s h s, h s s} →
    // dup = 1 - 4/5 = 0.2; top unigram = 6/7
    assert(out(3)._3 == math.floor(6.0 / 7.0 * 10000 + 0.5) / 10000)
    assert(out(3)._4 == 0.2)
  }

  test("tfidfTopTerms ranks group-distinctive terms first with " +
      "deterministic tie-breaks") {
    // 'alpha' only in g1, 'beta' only in g2, 'common' everywhere
    val df = Seq(
      ("g1", "common alpha alpha common"),
      ("g1", "alpha common"),
      ("g2", "common beta common"),
      ("g3", "common common")).toDF("src", "text")
    val out = TextAnalysis.tfidfTopTerms(df, "src", "text", k = 2)
      .orderBy("src", "rk")
      .as[(String, Int, String, Long, Double)].collect().toSeq
    // g1: alpha (tf=3, idf=ln 3) beats common (idf=0)
    assert(out(0)._1 == "g1" && out(0)._3 == "alpha" && out(0)._4 == 3L)
    assert(out(0)._5 > 0.0)
    assert(out(1)._3 == "common" && out(1)._5 == 0.0)
    assert(out(2)._1 == "g2" && out(2)._3 == "beta")
    // g3 has only zero-idf terms; rank is still filled deterministically
    assert(out.count(_._1 == "g3") == 1)
    assert(out(4)._3 == "common")
  }

  test("stripBoilerplateLines removes over-threshold lines, keeps " +
      "unique lines in order, and drops all-boilerplate docs") {
    val chrome = "cookie banner"
    val docs = (1 to 5).map(i => (i.toLong, s"$chrome\nbody $i\nfooter"))
      .toDF("id", "s")
      .union(Seq((6L, chrome)).toDF("id", "s"))
    val out = TextAnalysis.stripBoilerplateLines(docs, "id", "s",
        minDocs = 3)
      .orderBy("id").as[(Long, String)].collect().toSeq
    // chrome (6 docs) and footer (5 docs) censused out; bodies survive
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(out.forall { case (i, c) => c == s"body $i" })
  }

  test("stripBoilerplateLines preserves multi-line survivors in " +
      "original order and honors the threshold boundary") {
    val docs = Seq(
      (1L, "keep one\nshared\nkeep two"),
      (2L, "shared\nother"),
      (3L, "third")).toDF("id", "s")
    // shared appears in 2 docs; minDocs = 3 keeps it
    val keep = TextAnalysis.stripBoilerplateLines(docs, "id", "s", 3)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(keep(0)._2 == "keep one\nshared\nkeep two")
    // minDocs = 2 strips it from both docs
    val strip = TextAnalysis.stripBoilerplateLines(docs, "id", "s", 2)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(strip(0)._2 == "keep one\nkeep two")
    assert(strip(1)._2 == "other")
  }

  test("phraseSearch counts exact adjacent occurrences, including " +
      "overlapping and repeated-term phrases, and drops non-matches") {
    val df = Seq(
      (1L, "a b c a b c"),      // "a b c" twice
      (2L, "a c b"),            // terms present, order wrong
      (3L, "x a b c y"),        // once, mid-document
      (4L, "a a a a")).toDF("doc_id", "text")
    val out = TextAnalysis.phraseSearch(df, "doc_id", "text",
        Seq("a", "b", "c"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (3L, 1L)))
    // repeated-term phrase: "a a" in "a a a a" matches at 3 starts
    val rep = TextAnalysis.phraseSearch(df, "doc_id", "text", Seq("a", "a"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(rep.find(_._1 == 4L).map(_._2).contains(3L))
    // single-term phrase degenerates to term frequency
    val single = TextAnalysis.phraseSearch(df, "doc_id", "text", Seq("a"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(single.find(_._1 == 4L).map(_._2).contains(4L))
  }

  test("adaptiveLengthFilter: per-group quantile bands, outliers " +
      "flagged within their own group's distribution") {
    import spark.implicits._
    // group g1: lengths 1..20 plus a 1000-token outlier; group g2:
    // uniformly long docs where 1000 tokens would be NORMAL
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    val rows = (1 to 20).map(n => ("g1", n.toLong, doc(n))) ++
      Seq(("g1", 99L, doc(1000))) ++
      (1 to 10).map(i => ("g2", 100L + i, doc(900 + i * 20)))
    val out = TextAnalysis.adaptiveLengthFilter(
        rows.toDF("lang", "doc_id", "text"), "doc_id", "text", "lang")
      .as[(String, Long, Long, Double, Double, Boolean)].collect()
    val g1 = out.filter(_._1 == "g1").map(r => r._2 -> r._6).toMap
    // the 1000-token doc is an outlier IN g1 (its p95 sits ~100)...
    assert(!g1(99L))
    // ...while similar lengths are kept in g2, whose band covers them
    val g2 = out.filter(_._1 == "g2")
    assert(g2.count(_._6) >= 8)
    // band edges are group-local: every kept doc sits inside its band
    out.foreach { case (_, _, n, lo, hi, kept) =>
      assert(kept == (n >= lo && n <= hi))
    }
  }

  test("adaptiveLengthFilter: null-group documents keep their own " +
      "bounds row and a null text flags kept=false, never a null") {
    import spark.implicits._
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    val rows = Seq(
      (Option("en"), 1L, Option(doc(5))),
      (None, 2L, Option(doc(5))),       // failed langid: group NULL
      (None, 3L, Option(doc(5))),       // same length → band [5, 5]
      (Option("en"), 4L, Option.empty[String])) // null text
    val out = TextAnalysis.adaptiveLengthFilter(
        rows.toDF("lang", "doc_id", "text"), "doc_id", "text", "lang")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(0)) null else r.getString(0), r.getBoolean(5)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L)) // nobody vanished
    assert(out(2L)._1 == null && out(2L)._2)  // null group, own band
    assert(!out(4L)._2)                       // null text: kept = false
  }

  test("qualityRuleFlags: each rule fires on its designed violation " +
      "and only then; keep is the conjunction") {
    val good = "the quick brown fox jumps over a lazy dog of the north " +
      "and keeps to running in wide circles."
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "too short."),                          // ok_len fails
      (3L, good.replace(".", "")),                 // ok_terminal fails
      (4L, good + " ##### ##### #####."),          // ok_symbols fails
      (5L, "zx qw vb nm kj hg fd sa po iu yt re.") // ok_stopwords fails
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityRuleFlags(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(out(1L) == ((true, true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._6)
    assert(!out(3L)._3 && !out(3L)._6)
    assert(!out(4L)._4 && !out(4L)._6)
    assert(!out(5L)._5 && !out(5L)._6)
    // every failing doc fails through exactly its designed rule
    assert(out(3L)._1 && out(3L)._2 && out(3L)._4 && out(3L)._5)
  }

  private def cdcChunks(id: Long, text: String): Seq[(Int, String)] =
    TextAnalysis.contentChunks(
      Seq((id, text)).toDF("doc_id", "text"), "doc_id", "text",
      window = 4, divisor = 4)
      .collect().map(r => (r.getInt(1), r.getString(2)))
      .sortBy(_._1).toSeq

  test("contentChunks: full coverage in order, chunk numbering dense") {
    val toks = (0 until 80).map(i => s"w${i * 7 % 61}")
    val chunks = cdcChunks(1L, toks.mkString(" "))
    assert(chunks.map(_._2).mkString(" ") == toks.mkString(" "),
      "concatenated chunks must reproduce the document")
    assert(chunks.map(_._1) == chunks.indices.toSeq, "dense chunk_idx")
    assert(chunks.length >= 3, "fixture must actually chunk")
  }

  test("contentChunks: boundaries are content-local — a front insertion " +
      "leaves every later chunk intact (the property fixed-width loses)") {
    val toks = (0 until 80).map(i => s"w${i * 7 % 61}")
    val a = cdcChunks(1L, toks.mkString(" ")).map(_._2)
    val b = cdcChunks(2L, ("zzz" +: toks).mkString(" ")).map(_._2)
    // every chunk of A after its first boundary survives verbatim in B,
    // in order (B re-chunks only the prefix the new token's windows touch)
    val tailA = a.drop(1)
    assert(tailA.nonEmpty)
    val idx = b.indexOf(tailA.head)
    assert(idx >= 0 && b.slice(idx, idx + tailA.length) == tailA,
      s"suffix not preserved:\nA=$a\nB=$b")
  }

  test("fimTransform: PSM order, exact middle span, case preserved, " +
      "short-doc degenerate cuts") {
    val docs = Seq(
      (1L, "A b c d e F"),   // n=6: p=2, m=4 -> pre=A b, mid=c d, suf=e F
      (2L, "x y"),           // n=2: p=0, m=1 -> pre='', mid=x, suf=y
      (3L, "solo"))          // n=1: p=0, m=0 -> pre='', mid='', suf=solo
      .toDF("doc_id", "text")
    val out = TextAnalysis.fimTransform(docs, "doc_id", "text")
      .as[(Long, Int, String, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._3 == "<PRE>A b<SUF>e F<MID>c d")
    assert(out(2L)._3 == "<PRE><SUF>y<MID>x")
    assert(out(3L)._3 == "<PRE><SUF>solo<MID>")
    // the span slices exactly the middle back out of the transformed
    // string, for every doc including the empty-middle degenerate
    out.values.foreach { case (id, _, fim, s, e) =>
      val want = Map(1L -> "c d", 2L -> "x", 3L -> "")(id)
      assert(fim.substring(s, e) == want, s"doc $id")
    }
    assert(out(1L)._2 == 6 && out(2L)._2 == 2 && out(3L)._2 == 1)
  }

  test("tokenFertility aggregates counts and ratios per language") {
    val docs = Seq(
      (1L, "en", "hello world"),        // 2 tok, 3 subwords? no: 2 alpha runs
      (2L, "en", "a b, c"),             // 3 tok, 4 subwords (a,b,',',c)
      (3L, "zz", ""),                   // tokenCount('') = 1 (split conv.)
      (4L, "de", "straße!"))            // 1 tok, 2 subwords
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.tokenFertility(docs, "lang", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)), Option(r.get(6)))).toMap
    // en: 5 tokens, 6 subwords, 17 chars
    assert(out("en")._1 == 2L && out("en")._2 == 5L && out("en")._3 == 6L)
    assert(out("en")._4 == 17L && out("en")._5 == Some(3.4))
    assert(out("en")._6 == Some(1.2))
    // de: "straße!" = 1 ws token; subwords: 'stra', 'ß'? — regex is
    // ASCII-alpha, so runs split at 'ß': [stra] [ß] [e] -> 3? 'ß' is
    // non-alnum punct class match, 'e' alpha -> stra, ß, e, ! = 4
    assert(out("de")._2 == 1L && out("de")._3 == 4L)
    // the empty doc still counts 1 whitespace token (split convention),
    // so its ratios are 0.0 rather than the zero-token null path
    assert(out("zz")._2 == 1L && out("zz")._5 == Some(0.0))
  }

  test("codeScore separates indented/bracketed code from prose") {
    val docs = Seq(
      (1L, "def f(x):\n  return x;\n  y = [1];"),  // 2/3 indented, dense
      (2L, "Plain prose sentence without symbols here"),
      (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.codeScore(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 3L && out(1L)._3 == 0.6667 && out(1L)._5)
    assert(out(2L)._3 == 0.0 && out(2L)._4 == 0.0 && !out(2L)._5)
    assert(out(3L) == ((3L, 1L, 0.0, 0.0, false)))
  }

  test("dedupLines keeps first occurrences in order and counts removals") {
    val docs = Seq(
      (1L, "nav\nbody one\nnav\nbody two\nnav"),
      (2L, "only\nlines"),
      (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, "nav\nbody one\nbody two", 2L)))
    assert(out(2L) == ((2L, "only\nlines", 0L)))
    assert(out(3L) == ((3L, "x", 0L)))
  }

  test("charEntropy matches hand-computed values and zeroes empties") {
    val docs = Seq(
      (1L, "aaaa"),  // one symbol -> 0 bits
      (2L, "aabb"),  // uniform 2 -> 1 bit
      (3L, "abcd"),  // uniform 4 -> 2 bits
      (4L, "aab"),   // log2(3) - 2/3
      (5L, ""))      // empty -> (0, 0.0)
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 0.0)))
    assert(out(2L) == ((2L, 4L, 1.0)))
    assert(out(3L) == ((3L, 4L, 2.0)))
    assert(out(4L)._2 == 3L && out(4L)._3 == 0.918296)
    assert(out(5L) == ((5L, 0L, 0.0)))
  }

  test("packEfficiency: fill rate caps overhang at the budget and " +
      "counts over/underfilled sequences") {
    // one group (ids all even -> grp 0 with groups=1); budget 10:
    //   docs: 6, 6 -> seq 0 (12 tokens, overhang), seq 1 gets 8 -> under
    val docs = Seq(
      (0L, Seq.fill(6)("w").mkString(" ")),
      (1L, Seq.fill(6)("w").mkString(" ")),
      (2L, Seq.fill(8)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.packEfficiency(
        docs, "doc_id", "text", maxTokens = 10, groups = 1)
      .as[(Long, Long, Long, Long, Double, Long, Long)].collect()
    assert(out.length == 1)
    val (grp, nSeqs, nDocs, nToks, fill, over, under) = out.head
    assert((grp, nSeqs, nDocs, nToks) == ((0L, 2L, 3L, 20L)))
    // seq 0 holds 12 (capped to 10), seq 1 holds 8 -> fill = 18/20
    assert(fill == 0.9 && over == 1L && under == 1L)
  }

  test("zipfAudit: an exact power law fits slope -1 / r2 1; coverage " +
      "and total tokens count the head's share") {
    // frequencies 12, 6, 4, 3 = 12/rank: f*rank constant -> slope -1
    val words =
      Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++
        Seq.fill(3)("d") ++ Seq("e") // one tail term outside topN=4
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.zipfAudit(docs, "doc_id", "text", topN = 4)
      .as[(Int, Long, Double, Double, Double, Double)].head()
    val (topN, total, cov, slope, intercept, r2) = out
    assert(topN == 4 && total == 26L)
    assert(cov == math.rint(25.0 / 26.0 * 10000) / 10000)
    assert(slope == -1.0 && r2 == 1.0)
    assert(intercept == math.rint(math.log(12.0) * 10000) / 10000)
  }

  test("dedupSentences: corpus-wide first occurrence wins by (doc, " +
      "pos); within-doc repeats dedup; an all-duplicate doc rewrites " +
      "to empty, not to no row") {
    val docs = Seq(
      (1L, "The sky is blue. Water is wet."),
      (2L, "Water is wet. Grass grows! Water is wet."),
      (3L, "The sky is blue."))
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupSentences(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, "The sky is blue. Water is wet", 2L, 0L)))
    // doc 2: 'Water is wet' lost to doc 1 (and its own repeat too)
    assert(out(2L) == ((2L, "Grass grows", 1L, 2L)))
    // doc 3: everything seen first elsewhere -> empty rewrite
    assert(out(3L) == ((3L, "", 0L, 1L)))
  }

  test("licenseDetect: each family's normative phrase matches " +
      "case-insensitively; unlicensed and lookalike text stay null") {
    val docs = Seq(
      (1L, "/* PERMISSION IS HEREBY GRANTED, free of Charge ... */ code"),
      (2L, "// licensed under the apache license, version 2.0\nmain()"),
      (3L, "This program is free software: GNU General Public License."),
      (4L, "Redistribution and use in source and binary forms, with or"),
      (5L, "plain prose about licenses and permission, nothing normative"),
      (6L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.licenseDetect(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getBoolean(2))).toMap
    assert(out(1L) == ((Some("MIT"), true)))
    assert(out(2L) == ((Some("Apache-2.0"), true)))
    assert(out(3L) == ((Some("GPL"), true)))
    assert(out(4L) == ((Some("BSD"), true)))
    assert(out(5L) == ((None, false)) && out(6L) == ((None, false)))
  }

  test("readability: hand-computed Flesch over words/sentences/" +
      "vowel-group syllables; empty docs report null") {
    val docs = Seq(
      // 6 words, 2 sentences, syllables: the=1 cat=1 sat=1 here=2
      // it=1 slept=1 -> 7
      (1L, "The cat sat here. It slept!"),
      (2L, ""),               // no words -> null flesch
      (3L, "xyz qrst"))       // vowel-free words floor at 1 syllable
      .toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((6L, 2L, 7L)))
    val expect = BigDecimal(206.835 - 1.015 * 6 / 2.0 - 84.6 * 7 / 6.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getDouble(4) == expect)
    assert(out(2L).getLong(1) == 0L && out(2L).isNullAt(4))
    assert(out(3L).getLong(3) == 2L) // 1 + 1 floored syllables
  }

  test("zipfAudit: a flat template corpus reads slope 0 and a null r2 " +
      "(zero y-spread -> no power law, not a divide error)") {
    val docs = Seq((1L, "x y z w x y z w")).toDF("doc_id", "text")
    val row = TextAnalysis.zipfAudit(docs, "doc_id", "text", topN = 4)
      .collect().head
    assert(row.getDouble(3) == 0.0) // identical frequencies: zero slope
    assert(row.isNullAt(5))
  }

  test("clusterTerms: unique terms outrank shared ones; shared-by-all " +
      "terms score non-positive; ties break on the term") {
    val df = Seq(
      (0, "spark spark the"), (0, "spark rdd the"),
      (1, "duck pond the"), (1, "duck the"))
      .toDF("cluster", "text")
    val out = TextAnalysis.clusterTerms(df, "cluster", "text", k = 2)
      .as[(Int, String, Long, Double, Int)].collect()
      .map(r => (r._1, r._5) -> (r._2, r._3, r._4)).toMap
    // C = 2; unique terms (cdf 1): idf = ln(3/2); shared "the" (cdf 2):
    // idf = 0 -> score 0, always outranked by any unique term
    val idf1 = BigDecimal(math.log(3.0 / 2))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sc(cnt: Long) = BigDecimal(cnt * idf1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((0, 1)) == (("spark", 3L, sc(3))))
    assert(out((0, 2)) == (("rdd", 1L, sc(1))))
    assert(out((1, 1)) == (("duck", 2L, sc(2))))
    assert(out((1, 2)) == (("pond", 1L, sc(1))))
  }
}
