package graft.dedup

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the rain falls softly on the quiet green meadow tonight"

  private def docs = Seq(
    (1L, base),
    (2L, base), // exact dup of 1
    (3L, base.replace("tonight", "today")), // near dup of 1
    (4L, "completely different content about spark catalyst optimizer " +
      "rules and tungsten codegen execution pipelines for analytics"),
    (5L, "yet another unrelated document mentioning minhash banding " +
      "signatures buckets and locality sensitive hashing methods"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts under one fingerprint") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length == 4) // 1+2 collapse
    val dupGroup = out.find(_.getAs[Long]("n_dups") == 2).get
    assert(dupGroup.getAs[Long]("keeper") == 1L)
  }

  test("jaccard pairs find exact and near dups, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("incremental minhash against a persisted index equals the " +
      "full-corpus pairs involving a batch doc; params drift fails fast") {
    val path = graft.EntryKit.scratchTracked("lshidx").toString
    Dedup.saveLshIndex(docs, "doc_id", "text", path)
    val batch = Seq(
      (101L, base.replace("softly", "gently")), // near-dup of 1/2/3
      (102L, base.replace("softly", "gently")), // within-batch dup of 101
      (103L, "entirely novel content sharing no shingles with anything " +
        "stored in the index or elsewhere in this batch fixture"))
      .toDF("doc_id", "text")
    // 0.6: one word changed mid-text costs 3 of ~21 trigram shingles,
    // J ≈ 0.71 — above 0.6, below the canonical 0.8
    val got = Dedup.incrementalMinhashPairs(
        spark, path, batch, "doc_id", "text", 0.6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val full = Dedup.minhashPairs(
        docs.unionByName(batch), "doc_id", "text", 0.6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val expected = full.filter(p => p._1 > 100L || p._2 > 100L)
    assert(got == expected)
    assert(got.contains((1L, 101L)) && got.contains((101L, 102L)))
    assert(!got.exists(p => p._1 == 103L || p._2 == 103L))
  }

  test("an oversized index bucket decomposes into bounded cells with " +
      "exact candidate parity") {
    val path = graft.EntryKit.scratchTracked("lshidx2").toString
    val dupCorpus = (1L to 60L).map(i => (i, base)).toDF("doc_id", "text")
    Dedup.saveLshIndex(dupCorpus, "doc_id", "text", path)
    val batch = Seq((200L, base), (201L, "nothing in common with the " +
      "saturated corpus content at all in this row")).toDF("doc_id", "text")
    // cap of 8 forces g = ceil(60/8) = 8 chunks on every hot bucket
    val got = Dedup.incrementalMinhashPairs(
        spark, path, batch, "doc_id", "text", 0.8, maxBucketSize = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == (1L to 60L).map(i => (i, 200L)).toSet)
  }

  test("containment pairs catch a quote fully embedded in a long doc " +
      "that jaccard misses, match brute force, and salt preserves pairs") {
    val quote = "to be or not to be that is the question"
    val article = "the soliloquy opens with the line " + quote +
      " and scholars have debated its meaning across four centuries of " +
      "performance criticism and translation into every major language"
    val d = Seq((1L, quote), (2L, article), (3L, base)).toDF("doc_id", "text")
    def tokset(s: String) = s.toLowerCase.split("\\s+").toSet
    val brute = (for {
      (i, a) <- Seq((1L, quote), (2L, article), (3L, base))
      (j, b) <- Seq((1L, quote), (2L, article), (3L, base)) if i < j
      c = tokset(a).intersect(tokset(b)).size.toDouble /
        math.min(tokset(a).size, tokset(b).size)
      if c >= 0.9
    } yield (i, j)).toSet
    val got = Dedup.containmentPairs(d, "doc_id", "text", 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == brute && got.contains((1L, 2L)))
    // jaccard at the same threshold misses the asymmetric pair
    val jac = Dedup.jaccardPairs(d, "doc_id", "text", 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)))
    val salted = Dedup.containmentPairs(d, "doc_id", "text", 0.9, salt = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(salted == got)
  }

  test("containment bitset path (auto, vocab <= 64) equals the inverted " +
      "index on pairs AND scores, fixed and residue-derived corpora") {
    // 20-word vocabulary, docs drawing varied subsets incl. full-overlap
    // small-in-big shapes (the containment signal)
    val vocabWords = (0 until 20).map(i => s"w$i")
    val docs = (0L until 24L).map { i =>
      val k = 3 + (i % 9)
      val ws = (0L until k).map(j => vocabWords(((i * 5 + j * 3) % 20).toInt))
      (i, ws.mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.7, 0.9, 1.0)) {
      val inv = Dedup.containmentPairs(docs, "doc_id", "text", t)
        .as[(Long, Long, Double)].collect().toSet
      val auto = Dedup.containmentPairsAuto(docs, "doc_id", "text", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(auto == inv, s"bitset != inverted at t=$t")
    }
    // df cap forces the general path and still matches its own contract
    val capped = Dedup.containmentPairsAuto(docs, "doc_id", "text", 0.9,
      maxDf = Some(10L))
      .as[(Long, Long, Double)].collect().toSet
    val cappedInv = Dedup.containmentPairs(docs, "doc_id", "text", 0.9,
      maxDf = Some(10L))
      .as[(Long, Long, Double)].collect().toSet
    assert(capped == cappedInv)
  }

  test("char-ngram jaccard pairs equal brute-force trigram-set jaccard " +
      "(short texts, df cap, salt parity)") {
    val texts = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown fax"),
      (3L, "THE QUICK BROWN FOX"), (4L, "completely different words"),
      (5L, "ab"), (6L, "ab")) // shorter than n: whole text is the gram
    val df = texts.toDF("doc_id", "text")
    def grams(s: String): Set[String] = {
      val t = s.toLowerCase
      if (t.length < 3) Set(t) else t.sliding(3).toSet
    }
    for (threshold <- Seq(0.5, 0.8)) {
      val expected = (for {
        (i, a) <- texts; (j, b) <- texts if i < j
        inter = (grams(a) & grams(b)).size
        union = (grams(a) | grams(b)).size
        if inter.toDouble / union >= threshold
      } yield (i, j)).toSet
      val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, threshold)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(got == expected, s"t=$threshold")
      val salted = Dedup.ngramJaccardPairs(
        df, "doc_id", "text", 3, threshold, salt = 3)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(salted == expected, s"salted t=$threshold")
    }
    // df cap drops ubiquitous grams from the vocabulary on both sides
    val capped = Dedup.ngramJaccardPairs(
      df, "doc_id", "text", 3, 0.8, maxDf = Some(2L))
    assert(capped.columns.toSeq == Seq("id1", "id2", "jaccard"))
    // prefix-filtered form: identical relation (pairs AND values), with
    // and without the cap — the provably-complete candidate scheme
    for (cap <- Seq(None, Some(4L))) {
      val inv = Dedup.ngramJaccardPairs(
          df, "doc_id", "text", 3, 0.8, maxDf = cap)
        .as[(Long, Long, Double)].collect().toSet
      val pre = Dedup.ngramJaccardPairsPrefix(
          df, "doc_id", "text", 3, 0.8, maxDf = cap)
        .as[(Long, Long, Double)].collect().toSet
      assert(pre == inv, s"maxDf=$cap")
    }
  }

  test("salted jaccard join returns the identical pair set") {
    val plain = Dedup.jaccardPairs(docs, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    for (k <- Seq(2, 3, 8)) {
      val salted = Dedup.jaccardPairs(docs, "doc_id", "text", 0.8, salt = k)
        .as[(Long, Long, Double)].collect().toSet
      assert(salted == plain, s"salt=$k")
    }
  }

  test("posting-decomposed jaccard join returns identical pairs AND " +
      "values (duplicate-saturated corpus, oversized grams split)") {
    import org.apache.spark.sql.functions._
    // 6 base docs × 24 identical replicas: every gram's posting list
    // holds ≥24 ids, so maxPostings = 5 forces g ≥ 5 on every gram —
    // the decomposition must engage everywhere and lose/duplicate
    // nothing (a doubled cell meeting would inflate |∩| and shift the
    // jaccard VALUE, so comparing values pins the exactly-once algebra)
    val sat = docs.limit(6)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(23))).as("k"))
      .select((col("doc_id") * 100 + col("k")).as("doc_id"), col("text"))
    val plain = Dedup.jaccardPairs(sat, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(plain.nonEmpty)
    for (cap <- Seq(1, 5, 1000)) {
      val split = Dedup.jaccardPairs(sat, "doc_id", "text", 0.8,
          maxPostings = Some(cap))
        .as[(Long, Long, Double)].collect().toSet
      assert(split == plain, s"maxPostings=$cap")
    }
    // ngram form, with the RELATIVE-style df cap on top: parity holds
    // through cap + decomposition together
    val nplain = Dedup.ngramJaccardPairs(sat, "doc_id", "text", 3, 0.8,
        maxDf = Some(100L))
      .as[(Long, Long, Double)].collect().toSet
    val nsplit = Dedup.ngramJaccardPairs(sat, "doc_id", "text", 3, 0.8,
        maxDf = Some(100L), maxPostings = Some(7))
      .as[(Long, Long, Double)].collect().toSet
    assert(nsplit == nplain)
    // engagement: the legs really fan out — x replicates each posting
    // across its gram's g columns, so the leg outgrows the posting set
    val toks = sat
      .select(col("doc_id").as("id"), lit(1).as("sz"),
        explode(split(lower(col("text")), "\\s+")).as("w"))
      .distinct()
    val (x, _) = Dedup.saltedPostingLegs(toks, maxPostings = 5)
    assert(x.count() > toks.count())
    // and a small corpus under the cap pays zero replication
    val smallToks = docs.limit(3)
      .select(col("doc_id").as("id"), lit(1).as("sz"),
        explode(split(lower(col("text")), "\\s+")).as("w"))
      .distinct()
    val (xs, _) = Dedup.saltedPostingLegs(smallToks, maxPostings = 1000)
    assert(xs.count() == smallToks.count())
  }

  test("bitset jaccard equals the inverted index, values included") {
    val plain = Dedup.jaccardPairs(docs, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val bitset = Dedup.jaccardPairsBitset(docs, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(bitset == plain)
  }

  test("bitset jaccard matches inverted index on random small-vocab corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'z').map(_.toString)
    for (trial <- 0 until 3; threshold <- Seq(0.5, 0.8)) {
      val corpus = (1L to 40L).map { i =>
        val n = 3 + rnd.nextInt(20)
        (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val plain = Dedup.jaccardPairs(corpus, "doc_id", "text", threshold)
        .as[(Long, Long, Double)].collect().toSet
      val bitset = Dedup.jaccardPairsBitset(corpus, "doc_id", "text", threshold)
        .as[(Long, Long, Double)].collect().toSet
      assert(bitset == plain, s"trial=$trial t=$threshold")
    }
  }

  test("bitset jaccard fails fast past 64 distinct tokens; auto falls back") {
    val wide = (1L to 5L).map(i =>
      (i, (0 until 70).map(k => s"tok$k").mkString(" "))).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.jaccardPairsBitset(wide, "doc_id", "text", 0.8)
    }
    val auto = Dedup.jaccardPairsAuto(wide, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val plain = Dedup.jaccardPairs(wide, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto == plain && auto.nonEmpty)
  }

  test("minhash pipeline: candidates from LSH buckets only, verified " +
      "pairs match exact jaccard") {
    val verified = Dedup.minhashPairs(docs, "doc_id", "text", 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(verified == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // determinism: second run bit-identical
    val again = Dedup.minhashPairs(docs, "doc_id", "text", 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(again == verified)
  }

  test("JVM XXH64 seed chaining matches the xxhash64 expression") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.sql.functions.{lit, xxhash64}
    val fromExpr = Seq(1).toDF("x")
      .select(xxhash64(lit(3L), lit(12345L)).as("h")).as[Long].head()
    assert(fromExpr == XXH64.hashLong(12345L, XXH64.hashLong(3L, 42L)))
  }

  test("minhash candidate set prunes the pair space") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text").count()
    assert(cands < 10) // far below the 10 all-pairs
  }

  test("oversized LSH buckets decompose into bounded join cells with " +
      "exact candidate parity (duplicate-saturated corpus)") {
    // 200 byte-identical docs: every band hash collides, one (band, bh)
    // bucket holds the whole corpus — the unsplittable hot key
    val sat = (1L to 200L).map(i =>
        (i, "the exact same document text repeated everywhere"))
      .toDF("doc_id", "text")
    val cap = 16
    // parity: the decomposed join produces exactly the unsalted pair set
    val salted = Dedup.minhashCandidates(sat, "doc_id", "text",
        maxBucketSize = cap)
      .as[(Long, Long)].collect().toSet
    val unsalted = Dedup.minhashCandidates(sat, "doc_id", "text",
        maxBucketSize = Int.MaxValue)
      .as[(Long, Long)].collect().toSet
    assert(salted == unsalted)
    assert(salted.size == 200 * 199 / 2) // all true pairs survive
    // bound: no join cell carries more than ~cap members per leg
    // (hash-chunking is approximate, so allow 2× slack)
    val banded = Dedup.bandedSignatures(sat, "doc_id", "text", 128, 32, 3)
    val (x, y) = Dedup.saltedBandLegs(banded, cap)
    import org.apache.spark.sql.functions.{max => fmax}
    val maxCell = x.groupBy("band", "bh", "cx", "cy")
      .count().agg(fmax("count")).as[Long].head()
    assert(maxCell <= 2L * cap, s"cell of $maxCell members exceeds 2×$cap")
    assert(y.groupBy("band", "bh", "cx", "cy").count()
      .agg(fmax("count")).as[Long].head() <= 2L * cap)
    // and a normal-sized bucket pays zero replication (g = 1, one cell)
    val smallBanded = Dedup.bandedSignatures(docs, "doc_id", "text", 128, 32, 3)
    val (xs, ys) = Dedup.saltedBandLegs(smallBanded, Dedup.DefaultMaxBucketSize)
    assert(xs.count() == smallBanded.count())
    assert(ys.count() == smallBanded.count())
  }

  test("oversizedBandBuckets census: silent on a healthy corpus, reports " +
      "the saturated bucket with its chunk fan-out") {
    assert(Dedup.oversizedBandBuckets(docs, "doc_id", "text").count() == 0)
    val sat = (1L to 200L).map(i =>
        (i, "the exact same document text repeated everywhere"))
      .toDF("doc_id", "text")
    val census = Dedup.oversizedBandBuckets(sat, "doc_id", "text",
        maxBucketSize = 16)
      .as[(Int, Long, Long, Int)].collect()
    // all 32 bands collide on one 200-member bucket each
    assert(census.length == 32)
    assert(census.forall { case (_, _, n, g) =>
      n == 200 && g == math.ceil(200.0 / 16).toInt })
  }

  test("sourceOverlapMatrix: hand-computed pair stats, and the " +
      "maxSources cap removes ubiquitous grams from every number") {
    // a/b share 'x y z'; 'c c c' appears in all three sources
    val d = Seq(
      (1L, "A", "x y z"), (2L, "A", "c c c"),
      (3L, "B", "x y z w"), (4L, "B", "c c c"),
      (5L, "C", "p q r"), (6L, "C", "c c c")).toDF("id", "src", "text")
    // uncapped: A={xyz, ccc}, B={xyz, yzw, ccc}, C={pqr, ccc}
    val m0 = Dedup.sourceOverlapMatrix(d, "src", "text")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(m0(("A", "B")) == (("A", "B", 2L, 2L, 3L, 0.666667, 1.0)))
    assert(m0(("A", "C")) == (("A", "C", 1L, 2L, 2L, 0.333333, 0.5)))
    // cap at 2 sources: 'c c c' (df = 3) drops everywhere, so A∩C
    // vanishes and the A/B overlap is only the genuine shingle
    val m1 = Dedup.sourceOverlapMatrix(d, "src", "text",
        maxSources = Some(2))
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(!m1.contains(("A", "C")))
    assert(m1(("A", "B")) == (("A", "B", 1L, 1L, 2L, 0.5, 1.0)))
  }

  test("simhash nearPairs equals brute-force Hamming filter") {
    import org.apache.spark.sql.functions._
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    for ((bpd, dists) <- Seq(1 -> Seq(0, 1, 3, 7), 4 -> Seq(3, 7))) {
      val fp = SimHash.fingerprints(docs, "doc_id", "text", bpd)
        .as[(Long, String)].collect().toMap
      assert(fp.values.forall(_.length == 16 * bpd))
      for (d <- dists) {
        val expected = (for {
          i <- fp.keys.toSeq; j <- fp.keys.toSeq
          if i < j && ham(fp(i), fp(j)) <= d
        } yield (i, j, ham(fp(i), fp(j)))).toSet
        val got = SimHash.nearPairs(docs, "doc_id", "text",
          maxDist = d, bitsPerDigit = bpd)
          .as[(Long, Long, Int)].collect().toSet
        assert(got == expected, s"bitsPerDigit=$bpd maxDist=$d")
      }
    }
    // string-form popcount hamming matches the char-wise definition
    val hs = Seq(("1010101010101010", "1010101010101011", 1),
      ("0000000000000000", "1111111111111111", 16)).toDF("a", "b", "want")
      .select(SimHash.hammingStr(col("a"), col("b"), 16).cast("int").as("got"),
        col("want")).as[(Int, Int)].collect()
    assert(hs.forall { case (g, w) => g == w })
    // packed-long and string fingerprints agree
    val both = SimHash.fingerprintsLong(docs, "doc_id", "text", 4)
      .join(SimHash.fingerprints(docs, "doc_id", "text", 4), "id")
      .select(lpad(bin(col("fp")), 64, "0").as("rendered"), col("simhash"))
      .as[(String, String)].collect()
    assert(both.nonEmpty && both.forall { case (r, s) => r == s })
  }

  test("contamination finds only CROSS-set near-dups, oriented " +
      "(corpus_id, held_id)") {
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "one two three four five six seven eight"),
      (102L, "one two three four five six seven eight")) // within-set dup
      .toDF("doc_id", "text")
    val held = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // leaked!
      (2L, "totally different benchmark prompt words here"))
      .toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, held, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    // the leak is found, oriented corpus-side first, at jaccard 1
    assert(out == Set((100L, 1L, 1.0)))
    // the within-corpus duplicate (101,102) is NOT contamination
    assert(!out.exists { case (c, h, _) => c == 101L || c == 102L || h > 2L })
  }

  test("contamination tolerates OVERLAPPING id spaces (both sides " +
      "numbered from the same range)") {
    // corpus doc 1 and held doc 1 share an id value but are different
    // docs; held doc 1 leaks corpus doc 2's text — the cross pair must
    // surface as (2, 1), not be conflated or dropped
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val held = Seq(
      (1L, "one two three four five six seven eight"), // leaked, same id as c1
      (2L, "totally different benchmark prompt words here"))
      .toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, held, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((2L, 1L, 1.0)))
  }

  test("spanDupFractions: cross-doc spans count, within-doc repeats and " +
      "short docs do not") {
    val data = Seq(
      (1L, "t1 t2 t3 t4 t5 t6"), // spans [t1..t5, t2..t6]
      (2L, "t1 t2 t3 t4 t5 zz"), // shares t1..t5 with doc 1
      (3L, "q1 q2 q3"), // shorter than w: no spans
      // the 5-gram r1..r5 occurs TWICE here but in no other doc: a
      // within-doc repeat is not cross-corpus duplication
      (4L, "r1 r2 r3 r4 r5 r1 r2 r3 r4 r5"))
      .toDF("doc_id", "text")
    val out = Dedup.spanDupFractions(data, "doc_id", "text", w = 5)
      .orderBy("id").as[(Long, Int, Double)].collect().toSeq
    assert(out(0) == ((1L, 2, 0.5)))
    assert(out(1) == ((2L, 2, 0.5)))
    assert(out(2) == ((3L, 0, 0.0)))
    assert(out(3) == ((4L, 6, 0.0)))
  }

  test("winnowedSpanDup: a shared run of >= w + win - 1 tokens is always " +
      "caught; selection samples the span stream; short docs yield zero") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ") // w+win-1 = 8
    val data = Seq(
      (1L, s"a1 a2 a3 $shared a4 a5 a6"),
      (2L, s"b1 b2 $shared b3 b4 b5 b6"),
      (3L, (1 to 60).map(i => s"u$i").mkString(" ")), // unique long doc
      (4L, "q1 q2 q3")) // shorter than w
      .toDF("doc_id", "text")
    val out = Dedup.winnowedSpanDup(data, "doc_id", "text", w = 5, win = 4)
      .orderBy("id").as[(Long, Int, Double)].collect().toSeq
    // winnowing guarantee: both sharers select >= 1 common span
    assert(out(0)._3 > 0.0 && out(1)._3 > 0.0)
    assert(out(2) == ((3L, out(2)._2, 0.0)))
    assert(out(3) == ((4L, 0, 0.0)))
    // sampling: the unique 60-token doc has 56 full spans; winnowing
    // must select strictly fewer (~1/win of them)
    assert(out(2)._2 > 0 && out(2)._2 < 56)
    // determinism
    val again = Dedup.winnowedSpanDup(data, "doc_id", "text", w = 5, win = 4)
      .orderBy("id").as[(Long, Int, Double)].collect().toSeq
    assert(out == again)
  }

  test("contaminationFraction: full leak, partial overlap, clean, and " +
      "too-short held docs") {
    val train = Seq(
      (10L, "a b c d e f g h"),
      (11L, "p q r s t u v w")).toDF("doc_id", "text")
    val held = Seq(
      (1L, "a b c d e f g h"),      // verbatim train doc -> frac 1.0
      (2L, "a b c d e zz yy xx"),   // shares exactly 1 of 4 5-grams
      (3L, "m n o is clean here ok"), // zero overlap
      (4L, "too short")).toDF("doc_id", "text") // < 5 tokens -> 0 grams
    val out = Dedup.contaminationFraction(train, held, "doc_id", "text",
        n = 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 4L, 4L, 1.0),
      (2L, 4L, 1L, 0.25),
      (3L, 3L, 0L, 0.0),
      (4L, 0L, 0L, 0.0)))
  }

  test("simhash: identical docs share fingerprints, unrelated docs do not") {
    val fp = SimHash.fingerprints(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L).length == 16 && fp(1L).forall(c => c == '0' || c == '1'))
    assert(fp(1L) != fp(4L))
    val pairs = SimHash.identicalPairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("templateGroups collapses digit/whitespace/case variants that " +
      "exact dedup keeps apart") {
    val docs = Seq(
      (1L, "Order 123 shipped"),
      (2L, "order   456 SHIPPED"),   // digits+ws+case differ: same template
      (3L, "order cancelled"),
      (4L, "v1.2.3 build 99"),
      (5L, "v9.0.1 build 7"))        // same shape: v#.#.# build #
      .toDF("doc_id", "text")
    val exact = Dedup.exact(docs, "doc_id", "text").count()
    assert(exact == 5) // all byte-distinct
    val out = Dedup.templateGroups(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L, 4L -> 2L))
  }

  test("lshPlan: divisor splits, textbook midpoints, degenerate-split " +
      "error areas, and the best flag on the minimum cost") {
    val out = LshPlan.plan(spark, totalHashes = 128, threshold = 0.5)
      .as[(Int, Int, Double, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1, 2, 4, 8, 16, 32, 64, 128))
    assert(out.values.forall(r => r._1 * r._2 == 128))
    // (16 bands, 8 rows): t* = (1/16)^(1/8) = 2^-0.5
    assert(out(16)._3 == 0.7071)
    // b=128,r=1: collides on ANY shared hash -> catches all, floods fp
    assert(out(128)._5 < 0.01 && out(128)._4 > 0.3)
    // b=1,r=128: needs ALL hashes equal -> near-zero fp, loses recall
    assert(out(1)._4 < 0.01 && out(1)._5 > 0.3)
    // best flags exactly the minimum-cost split(s)
    val mc = out.values.map(_._6).min
    assert(out.values.forall(r => r._7 == (r._6 == mc)))
    assert(out.values.count(_._7) >= 1)
  }
}
