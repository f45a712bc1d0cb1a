package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Content-level deduplication operators for large-scale text corpora.
  *
  * Three tiers, by cost and recall:
  *  - exact:   one hash-aggregate pass (fingerprint groupBy)
  *  - jaccard: EXACT near-dup pairs via an inverted-index join — no
  *    all-pairs product, but token-frequency skew can fan out; intended
  *    for verification and small/medium corpora
  *  - minhash: banded MinHash-LSH — the 100 TB path: per-doc signatures,
  *    candidate pairs only within equal LSH buckets, then exact
  *    verification of the candidates. Cost scales with corpus size +
  *    bucket collisions, never with the pair product.
  */
object Dedup {

  /** Ensure a compute-bound stage has at least one partition per core
    * (no-op on already-wide inputs — the 100 TB case). See
    * [[graft.operators.Widen]].
    */
  private[graft] def widen(df: DataFrame): DataFrame =
    graft.operators.Widen(df)

  /** Word n-gram shingle set (lowercased, whitespace-tokenized). Prefer
    * [[shinglesOfTokens]] over a PRE-STAGED token column inside
    * operators: handing this an inline text expression re-runs the
    * split() once per shingle (higher-order functions block
    * subexpression elimination).
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesOfTokens(split(lower(text), "\\s+"), n)

  /** [[shingles]] over an already-tokenized array column — the form
    * every internal call site uses, after materializing the token array
    * in its own projection stage so the shingle lambda slices a column
    * reference instead of re-splitting per element.
    */
  def shinglesOfTokens(words: Column, n: Int): Column =
    when(size(words) >= n,
      array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + lit(1), lit(n))))))
      .otherwise(array_distinct(array(concat_ws(" ", words))))

  /** Cross-source overlap matrix — the curation report that answers
    * "how much does source A duplicate source B" at the SOURCE level
    * (CommonCrawl snapshot vs snapshot, vendor corpus vs scrape):
    * each source collapses to its distinct word-shingle vocabulary,
    * and every source pair reports the intersection size, Jaccard, and
    * containment (n_common / min-side — the "one corpus swallows the
    * other" signal Jaccard hides when sizes are skewed).
    *
    * Scale shape: the corpus collapses IMMEDIATELY to distinct
    * (source, gram) postings — the only corpus-sized pass — and the
    * pair join fans out per gram as (#sources containing it)², so
    * `maxSources` is the mandatory valve at scale: a gram present in
    * more than that many sources discriminates nothing and is dropped
    * from the vocabulary BEFORE sizes and intersections (the
    * [[ngramJaccardPairs]] df-cap convention lifted one level, to
    * source granularity — fanout is bounded by cap², never by corpus
    * duplication).
    */
  def sourceOverlapMatrix(docs: DataFrame, src: String, text: String,
      shingleN: Int = 3, maxSources: Option[Int] = None): DataFrame = {
    // materialized: the postings feed the cap census, per-source
    // sizes, and both legs of the pair join
    val grams = widen(docs)
      .select(col(src).as("src"), split(lower(col(text)), "\\s+").as("__w"))
      .select(col("src"), explode(shinglesOfTokens(col("__w"), shingleN))
        .as("g"))
      .distinct()
      .localCheckpoint()
    val kept = maxSources match {
      case Some(cap) =>
        val hot = grams.groupBy(col("g"))
          .agg(count(lit(1)).as("__df")).where(col("__df") > cap)
          .select(col("g"))
        grams.join(hot, Seq("g"), "left_anti").localCheckpoint()
      case None => grams
    }
    val sz = kept.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val inter = kept.as("a").join(kept.as("b"),
        col("a.g") === col("b.g") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sz.select(col("src").as("src_a"), col("n").as("n_a")), "src_a")
      .join(sz.select(col("src").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_common"),
        col("n_a"), col("n_b"),
        round(col("n_common") /
          (col("n_a") + col("n_b") - col("n_common")), 6).as("jaccard"),
        round(col("n_common") / least(col("n_a"), col("n_b")), 6)
          .as("containment"))
  }

  /** Exact dedup: fingerprint groupBy keeping the smallest id
    * (the distributed form of "drop exact duplicates").
    */
  def exact(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(md5(col(text)).as("fp"))
      .agg(min(col(id)).as("keeper"), count(lit(1)).as("n_dups"))

  /** Template (structural) dedup — the boilerplate-page catch exact
    * hashing misses: pages differing ONLY in digits (ids, counters,
    * timestamps, prices) and whitespace collapse to one fingerprint
    * (lowercase+trim, digit runs → '#', whitespace runs → one space).
    * This is the cheap tier between exact dedup and MinHash: product
    * pages, pagination shells, and log dumps are template families long
    * before they're token-level near-dups. Same one-aggregate shape as
    * [[exact]]: the masking is a per-row codegen'd projection, the
    * group state is constant, and the shuffle carries md5 keys.
    */
  def templateGroups(docs: DataFrame, id: String, text: String)
      : DataFrame =
    docs.groupBy(md5(regexp_replace(regexp_replace(
        lower(trim(col(text))), "[0-9]+", "#"), "\\s+", " ")).as("fp"))
      .agg(min(col(id)).as("keeper"), count(lit(1)).as("n_members"))

  /** Per-document duplicated-span fraction — the exact-substring-dedup
    * signal (Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better"): for each document, the fraction of its
    * sliding `w`-token windows that also occur verbatim in at least one
    * OTHER document. Documents near 1.0 are copies or heavy quoters;
    * the signal feeds span-level removal or doc-level down-weighting.
    *
    * Distributed shape: one explode to (id, span) rows keyed by the
    * span's md5 (a 32-char key regardless of `w`, so the shuffle carries
    * fixed-width rows, not w-token strings), a two-stage count-distinct
    * per span, and a join back — cost is linear in corpus token count.
    * The hot keys ARE the duplicated spans, but the per-span aggregate
    * output is one row per span, so the join-back fans out only to the
    * documents that contain the span — exactly the rows the answer
    * needs. Documents shorter than `w` tokens have no spans: n_spans 0,
    * fraction 0.0. Fractions use the engine-stable floor quantization.
    * Output: (id, n_spans, dup_span_frac).
    */
  def spanDupFractions(
      docs: DataFrame, id: String, text: String, w: Int): DataFrame = {
    require(w >= 2, s"span width must be >= 2, got $w")
    val q4 = (c: Column) => floor(c * 10000.0 + lit(0.5)) / 10000.0
    // staged projection: materialize the token array once per row before
    // the span lambda slices it — an inlined split() re-runs per element
    // (HOFs block subexpression elimination; see repetitionSignals)
    val ts = col("__ts")
    val spans = when(size(ts) >= w,
      transform(sequence(lit(1), size(ts) - (w - 1)),
        i => md5(concat_ws(" ", slice(ts, i, lit(w))))))
      .otherwise(array().cast("array<string>"))
    // materialized: the span rows feed BOTH the per-span df aggregate
    // and the join-back leg — without the cut the tokenize+md5 explode
    // runs twice (the ngram-jaccard postings pattern)
    val s = widen(docs)
      .select(col(id).as("id"),
        split(lower(trim(col(text))), "\\s+").as("__ts"))
      .select(col("id"), explode(spans).as("sh"))
      .localCheckpoint()
    spanDupFromPostings(docs, id, s)
  }

  /** Shared tail of the span-dup operators: census the (id, sh) posting
    * rows for cross-doc duplication (a span counts iff ≥ 2 DISTINCT docs
    * contain it), roll up per doc, and re-attach zero rows for docs that
    * produced no postings.
    */
  private def spanDupFromPostings(
      docs: DataFrame, id: String, s: DataFrame): DataFrame = {
    val q4 = (c: Column) => floor(c * 10000.0 + lit(0.5)) / 10000.0
    val df = s.groupBy(col("sh"))
      .agg(countDistinct(col("id")).as("nd"))
    val per = s.join(df, "sh")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("dup"))
      .select(col("id"), col("n").cast("int").as("n_spans"),
        q4(col("dup").cast("double") / col("n").cast("double"))
          .as("dup_span_frac"))
    widen(docs).select(col(id).as("id")).join(per, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_spans"), lit(0)).as("n_spans"),
        coalesce(col("dup_span_frac"), lit(0.0)).as("dup_span_frac"))
  }

  /** Exact-substring-dedup REWRITE (the output side of Lee et al. 2021:
    * not just measuring duplicated spans but excising them): every
    * token covered by some w-token window that occurs verbatim in ≥ 2
    * distinct documents is dropped, and the surviving tokens re-join
    * into `clean_text`. Returns (id, n_tokens, n_removed, clean_text)
    * for every input doc (short docs pass through untouched).
    *
    * Scale shape: postings are the same fixed-width md5 keys as
    * [[spanDupFractions]] (linear in corpus tokens, checkpointed once
    * for census + join-back); the duplicated-start sets return to their
    * docs keyed by id; the rewrite itself is per-row array arithmetic —
    * covered positions flatten from the start list and the keep-set is
    * a hash-based `array_except`, so no per-token linear scan of the
    * start list and nothing corpus-wide ever sorts.
    */
  def removeDupSpans(
      docs: DataFrame, id: String, text: String, w: Int): DataFrame = {
    require(w >= 2, s"span width must be >= 2, got $w")
    val ts = col("__ts")
    val spansWithPos = when(size(ts) >= w,
      transform(sequence(lit(1), size(ts) - (w - 1)),
        i => struct((i - 1).as("p"), md5(concat_ws(" ", slice(ts, i, lit(w)))).as("sh"))))
      .otherwise(array().cast("array<struct<p:int,sh:string>>"))
    val base = widen(docs)
      .select(col(id).as("id"), split(lower(trim(col(text))), "\\s+").as("__ts"))
    val posts = base
      .select(col("id"), explode(spansWithPos).as("ps"))
      .select(col("id"), col("ps.p").as("p"), col("ps.sh").as("sh"))
      .localCheckpoint()
    val dup = posts.groupBy(col("sh"))
      .agg(countDistinct(col("id")).as("nd"))
      .where(col("nd") >= 2).select(col("sh"))
    val starts = posts.join(dup, "sh")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("p"))).as("starts"))
    val covered = array_distinct(flatten(transform(
      col("starts"), s => sequence(s, s + w - 1))))
    base.join(starts, Seq("id"), "left")
      .select(col("id"), col("__ts"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .select(col("id"), col("__ts"), covered.as("covered"))
      .select(
        col("id"),
        size(col("__ts")).as("n_tokens"),
        size(col("covered")).as("n_removed"),
        concat_ws(" ", transform(
          array_except(sequence(lit(0), size(col("__ts")) - 1), col("covered")),
          i => element_at(col("__ts"), i + 1))).as("clean_text"))
  }

  /** Winnowed duplicated-span fraction — the 100 TB form of
    * [[spanDupFractions]] (Schleimer et al. 2003, the MOSS winnowing
    * scheme): instead of shuffling EVERY w-token window, each document
    * selects only the windows that are the minimum hash of some length-
    * `win` window run (leftmost tie-break), ~1/win of the full posting
    * volume, and the census runs over the selected sample. The winnowing
    * guarantee transfers: two documents sharing a verbatim run of at
    * least w + win − 1 tokens select at least one common span, so long
    * copies are always caught; what the sample trades away is
    * RESOLUTION on short overlaps, not recall on real duplication.
    *
    * Selection is per-row array arithmetic (O(spans · win) string
    * compares, staged projections keep it single-pass); only selected
    * spans explode into postings, so the shuffle is ~corpus/win rows of
    * fixed-width md5 keys. `n_spans` counts SELECTED spans and the
    * fraction is over the selection — directly comparable across docs,
    * deterministically reproducible in SQL. Output:
    * (id, n_spans, dup_span_frac).
    */
  def winnowedSpanDup(
      docs: DataFrame, id: String, text: String, w: Int,
      win: Int): DataFrame = {
    require(w >= 2 && win >= 1,
      s"need span width >= 2 and window >= 1, got w=$w win=$win")
    val ts = col("__ts")
    val hs = col("__hs")
    val spanHashes = when(size(ts) >= w,
      transform(sequence(lit(1), size(ts) - (w - 1)),
        i => md5(concat_ws(" ", slice(ts, i, lit(w))))))
      .otherwise(array().cast("array<string>"))
    // window start s selects position s-1+pos(min of hs[s, s+win-1]);
    // consecutive windows usually agree, array_distinct collapses them.
    // Docs with no spans must short-circuit: array_min(empty) is null
    // and a null index would explode into a null posting row.
    val selIdx = when(size(hs) >= 1,
      array_distinct(transform(
        sequence(lit(1), greatest(lit(1), size(hs) - (win - 1))),
        s => {
          val sl = slice(hs, s, lit(win))
          s - 1 + array_position(sl, array_min(sl))
        })))
      .otherwise(array().cast("array<bigint>"))
    val selected = transform(selIdx, p => element_at(hs, p.cast("int")))
    val s = widen(docs)
      .select(col(id).as("id"),
        split(lower(trim(col(text))), "\\s+").as("__ts"))
      .select(col("id"), spanHashes.as("__hs"))
      .select(col("id"), explode(selected).as("sh"))
      .localCheckpoint()
    spanDupFromPostings(docs, id, s)
  }

  /** ceil(t·sz) on doubles can land 1 ulp above an integer (0.8·10 →
    * 8.000000000000002 → ceil 9), silently tightening a bound and
    * breaking completeness; round to 6 decimals first.
    */
  private def tceil(threshold: Double, sz: Column): Column =
    ceil(round(lit(threshold) * sz, 6))

  /** EXACT word-set Jaccard pairs ≥ threshold via a counted inverted
    * index: one token self-join (shuffle by token) feeding a map-side-
    * combining count aggregate — |∩| per pair — with set sizes carried in
    * the token rows (computed in the projection, so no size-lookup joins).
    * A symmetric size filter (J ≤ min/max, so J ≥ t needs
    * min(sz) ≥ ⌈t·max(sz)⌉) prunes pairs inside the join before the
    * aggregate sees them.
    *
    * Cost model: fanout is Σ df(token)² tiny (id,id) rows — never the
    * full per-pair token SETS, which is why this beats prefix-filtered
    * candidate+verify ([[jaccardPairsPrefix]]) on dup-dense corpora where
    * most colliding pairs really do qualify (verification there shuffles
    * two full arrays per candidate). On dup-SPARSE corpora with heavy
    * stopword skew the prefix variant wins; at true scale use minhash().
    */
  /** @param salt two-sided salting factor for the token self-join. A
    *   skewed vocabulary (few very-frequent tokens) hashes all of a hot
    *   token's pairs into ONE shuffle partition, and AQE cannot split a
    *   single key — the classic stuck-straggler. With `salt = k`, each
    *   side carries its own `hash(id) % k` and replicates the other
    *   side's salt 0..k-1, turning every token into k² balanced join
    *   keys; each qualifying pair still meets exactly once (a's replica
    *   at b's salt × b's replica at a's salt), so no dedup is added.
    *   Costs k× shuffle volume of the tiny (id, sz, w) rows; leave at 1
    *   for well-spread vocabularies.
    */
  /** @param maxPostings adaptive per-gram g×g decomposition cap
    *   ([[saltedPostingLegs]]): no join key carries more than ~this
    *   many posting rows per side. The scale valve for RELATIVE df
    *   caps; subsumes `salt` (leave salt at 1 when set).
    */
  def jaccardPairs(
      docs: DataFrame, id: String, text: String,
      threshold: Double, maxDf: Option[Long] = None,
      salt: Int = 1, maxPostings: Option[Int] = None): DataFrame =
    pairsFromTokens(tokensWithSize(docs, id, text, maxDf), threshold, salt,
      maxPostings)

  /** Character n-gram set of `text`, lowercased — the tokenizer for
    * scripts without word boundaries (CJK), OCR noise, and code, where
    * word sets miss near-dups. Interpreted HOF cost is O(len·n) per row
    * (substr per gram) — fine for shingling, keep it out of pair loops.
    * Internal call sites stage the lowercase into its own projection and
    * use [[charShinglesOfLower]]: an inline lower(text) here re-runs
    * once per gram (HOFs block subexpression elimination), turning the
    * per-row cost O(len²).
    */
  def charShingles(text: Column, n: Int): Column =
    charShinglesOfLower(lower(text), n)

  /** [[charShingles]] over an already-lowercased string column. */
  def charShinglesOfLower(t: Column, n: Int): Column = {
    val cnt = length(t) - lit(n - 1)
    when(cnt >= 1,
      array_distinct(transform(sequence(lit(1), cnt), i => t.substr(i, lit(n)))))
      .otherwise(array_distinct(array(t)))
  }

  /** EXACT character-n-gram Jaccard pairs ≥ threshold — [[jaccardPairs]]
    * with the word tokenizer swapped for [[charShingles]]; same counted
    * inverted index, size filter, and salt/df-cap valves. The n-gram
    * domain is denser than words (every doc shares common trigrams), so
    * at scale ALWAYS pair this with `maxDf` — ubiquitous grams
    * discriminate nothing and dominate the Σ df² join fanout.
    *
    * Prefer an ABSOLUTE `maxDf` constant: the in-bucket join work is
    * Σ_grams df², so a cap that scales with the corpus admits grams
    * whose df² pair fanout is Θ(corpus²) — measured empirically at
    * exponent 1.46 on the 25× replication stress (STRESS_r10_f25.json:
    * 0.73 s → 80 s with cap 100·f) vs sub-second with the cap held at
    * 100. When capped-out grams still matter for the similarity domain
    * (so a relative cap is the operational knob), pair it with
    * `maxPostings`: the adaptive g×g posting decomposition
    * ([[saltedPostingLegs]]) bounds every join key at ~maxPostings rows
    * per side, so the admitted fanout spreads over independent
    * AQE-balanceable cells instead of landing on one unsplittable hot
    * key — total work is still Σ df² (that is the exact-Jaccard
    * contract), but it parallelizes instead of straggling.
    */
  def ngramJaccardPairs(
      docs: DataFrame, id: String, text: String, n: Int,
      threshold: Double, maxDf: Option[Long] = None,
      salt: Int = 1, maxPostings: Option[Int] = None): DataFrame = {
    val sets = widen(docs)
      .select(col(id).as("id"), lower(col(text)).as("__t"))
      .select(col("id"), charShinglesOfLower(col("__t"), n).as("ts"))
    pairsFromTokens(withSizes(sets, maxDf), threshold, salt, maxPostings)
  }

  /** The counted-inverted-index pair join over exploded (id, sz, w)
    * token rows — shared by the word and char-n-gram forms.
    *
    * The postings are MATERIALIZED once (eager localCheckpoint) before
    * the self-join: a self-join re-evaluates its input plan on BOTH
    * legs, so without the cut the tokenizer (O(len·n) substr/distinct
    * work per row) runs twice more than necessary — measured 4.3 s →
    * ~2 s on the char-trigram bench entry, where tokenization dominated
    * the un-materialized plan. Storage is one copy of the posting rows,
    * reclaimed by the ContextCleaner; on a cluster the checkpoint also
    * stops the shuffle-side of each leg from re-scanning the corpus.
    */
  /** The (x, y) legs of the POSTING self-join with the minhash-style
    * adaptive g×g decomposition ([[saltedBandLegs]]' algebra on the
    * per-gram posting lists): a gram with df = n > maxPostings splits
    * into g = ⌈n / maxPostings⌉ id-hash chunks, the x leg replicates
    * each posting across the g columns of its chunk row, the y leg
    * across the g rows of its chunk column, and the join key becomes
    * (w, cx, cy) — a pair (a, b) meets in EXACTLY the
    * (chunk(a), chunk(b)) cell, so the counted-index |∩| parity is
    * exact while no join key ever carries more than ~maxPostings rows
    * per side. This is what makes a CORPUS-RELATIVE df cap safe: an
    * absolute cap bounds per-gram work outright, but when the cap
    * scales with the corpus a hot gram's df² pair fanout otherwise
    * lands on ONE unsplittable shuffle key (the Θ(f²)-wall-clock
    * stress reading, STRESS_r10_f25 exponent 1.46) — decomposed, the
    * same fanout spreads over g² independent, AQE-balanceable cells.
    * Normal grams have g = 1: one cell, zero replication — free until
    * a posting list actually overflows (the saltedBandLegs guarantee).
    */
  private[dedup] def saltedPostingLegs(
      toks: DataFrame, maxPostings: Int): (DataFrame, DataFrame) = {
    require(maxPostings > 0, "maxPostings must be positive")
    // census only OVERSIZED grams: slim (w) rows with map-side combine;
    // empty census → AQE broadcasts the annotation join for ~free
    val over = toks.groupBy(col("w"))
      .agg(count(lit(1)).as("__n")).where(col("__n") > maxPostings)
      .select(col("w"),
        ceil(col("__n") / lit(maxPostings)).cast("int").as("__g"))
    val withG = toks.join(over, Seq("w"), "left")
      .withColumn("g", coalesce(col("__g"), lit(1))).drop("__g")
      .localCheckpoint()
    val chunk = pmod(xxhash64(col("id")), col("g")).cast("int")
    val x = withG.withColumn("cx", chunk)
      .withColumn("cy", explode(sequence(lit(0), col("g") - 1)))
    val y = withG.withColumn("cy", chunk)
      .withColumn("cx", explode(sequence(lit(0), col("g") - 1)))
    (x.drop("g"), y.drop("g"))
  }

  private def pairsFromTokens(
      toks0: DataFrame, threshold: Double, salt: Int,
      maxPostings: Option[Int] = None): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    require(maxPostings.isEmpty || salt == 1,
      "maxPostings (adaptive per-gram decomposition) subsumes the " +
        "static two-sided salt — use one or the other")
    val toks = toks0.localCheckpoint()
    val allSalts = array((0 until salt).map(lit): _*)
    val (a, b, saltCond) = maxPostings match {
      case Some(cap) =>
        val (x, y) = saltedPostingLegs(toks, cap)
        (x.as("a"), y.as("b"),
          col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy"))
      case None if salt == 1 => (toks.as("a"), toks.as("b"), lit(true))
      case None => (
        toks.withColumn("__sa", pmod(xxhash64(col("id")), lit(salt)))
          .withColumn("__sb", explode(allSalts)).as("a"),
        toks.withColumn("__sb", pmod(xxhash64(col("id")), lit(salt)))
          .withColumn("__sa", explode(allSalts)).as("b"),
        col("a.__sa") === col("b.__sa") && col("a.__sb") === col("b.__sb"))
    }
    a.join(b,
        col("a.w") === col("b.w") && saltCond && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")) >=
            tceil(threshold, greatest(col("a.sz"), col("b.sz"))))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.sz").as("sz1"), col("b.sz").as("sz2"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter") / (col("sz1") + col("sz2") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Exploded (id, token) rows with the doc's distinct-token-set size
    * carried in each row. Uncapped, sizes come straight from the
    * projection (zero shuffles); with a df cap, tokens in more than
    * `maxDf` docs are dropped from the vocabulary first (sets, sizes and
    * pairs all see the capped vocabulary) which costs one small
    * re-aggregation. The cap is a scale valve: ultra-common tokens
    * dominate the Σ df² fanout while discriminating nothing.
    */
  private def tokensWithSize(
      docs: DataFrame, id: String, text: String,
      maxDf: Option[Long]): DataFrame =
    withSizes(widen(docs).select(col(id).as("id"),
      array_distinct(split(lower(col(text)), "\\s+")).as("ts")), maxDf)

  /** Explode a (id, ts: array<string>) token-set frame into (id, sz, w)
    * rows, optionally dropping tokens above the df cap first.
    *
    * The SET frame is materialized first (eager localCheckpoint): the
    * tokenizer is O(len·n) substr/distinct work per row, and every
    * consumer below — `size(ts)` next to `explode(ts)` (which the
    * optimizer inlines into the Generate, re-evaluating the array per
    * OUTPUT row), the df census, the capped re-join — would otherwise
    * re-run it. Measured on the char-trigram bench entry: 3.3 s of
    * repeated tokenization collapses to one ~0.5 s pass reading stored
    * arrays. Storage is one copy of the token arrays, reclaimed by the
    * ContextCleaner.
    */
  private def withSizes(sets0: DataFrame, maxDf: Option[Long]): DataFrame = {
    val sets = sets0.localCheckpoint()
    maxDf match {
      case None =>
        sets.select(col("id"), size(col("ts")).as("sz"),
          explode(col("ts")).as("w"))
      case Some(cap) =>
        val words = sets.select(col("id"), explode(col("ts")).as("w"))
        val rare = words.groupBy(col("w"))
          .agg(count(lit(1)).as("df")).where(col("df") <= cap)
          .select(col("w"))
        // materialize the CAPPED postings once (eager localCheckpoint):
        // they feed the size re-aggregation and both sides of the pair
        // self-join, and without a cut each consumer re-runs the whole
        // tokenizer transform (O(len·n) per row — measured ~5× the
        // shingling cost per query). Storage is one copy of the post-cap
        // postings — the SMALLER side, never the uncapped vocabulary —
        // reclaimed with the RDD by the ContextCleaner. The df census
        // itself still streams off the raw text, so tokenization runs
        // exactly twice end-to-end (census + this materialization).
        val capped = words.join(broadcast(rare), "w").localCheckpoint()
        capped.join(
          capped.groupBy(col("id")).agg(count(lit(1)).as("sz")), "id")
          .select(col("id"), col("sz"), col("w"))
    }
  }

  /** EXACT containment pairs — the ASYMMETRIC near-dup relation
    * C(small→big) = |A∩B| / min(|A|, |B|): the fraction of the SMALLER
    * document's word set found in the other. Jaccard misses the
    * quote-inclusion shape (a tweet embedded verbatim in an article
    * scores J ≈ |tweet|/|article| ≈ 0 but containment 1.0); training-
    * data curation wants both relations.
    *
    * Same counted inverted index as [[jaccardPairs]] (one token
    * self-join feeding a map-side-combining count, sizes carried in the
    * token rows) but WITHOUT the symmetric size filter — containment is
    * precisely the relation where a tiny set may fully match a huge
    * one, so size asymmetry prunes nothing. That makes the df cap the
    * load-bearing scale valve here: every shared token joins, so cap
    * ubiquitous tokens (`maxDf`) exactly as the n-gram variant does.
    * Output: (id1, id2, containment) with id1 < id2.
    */
  def containmentPairs(
      docs: DataFrame, id: String, text: String,
      threshold: Double, maxDf: Option[Long] = None,
      salt: Int = 1): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val toks = tokensWithSize(docs, id, text, maxDf).localCheckpoint()
    val allSalts = array((0 until salt).map(lit): _*)
    val (a, b, saltCond) =
      if (salt == 1) (toks.as("a"), toks.as("b"), lit(true))
      else (
        toks.withColumn("__sa", pmod(xxhash64(col("id")), lit(salt)))
          .withColumn("__sb", explode(allSalts)).as("a"),
        toks.withColumn("__sb", pmod(xxhash64(col("id")), lit(salt)))
          .withColumn("__sa", explode(allSalts)).as("b"),
        col("a.__sa") === col("b.__sa") && col("a.__sb") === col("b.__sb"))
    a.join(b, col("a.w") === col("b.w") && saltCond &&
        col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.sz").as("sz1"), col("b.sz").as("sz2"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("containment",
        col("inter") / least(col("sz1"), col("sz2")))
      .where(col("containment") >= threshold)
      .select(col("id1"), col("id2"), col("containment"))
  }

  /** Cross-corpus contamination scan (decontamination): near-duplicate
    * pairs BETWEEN a training corpus and a held-out/benchmark set via the
    * same MinHash-LSH banding as [[minhashPairs]] — the union is banded
    * once, candidates verify exactly, and only cross-set pairs survive
    * (within-set duplicates are the dedup pipeline's business, not
    * contamination). Ids must be unique WITHIN each input; the two id
    * spaces may overlap (both numbered from 0 is the common case) — ids
    * are namespaced internally with the side tag before banding, so a
    * corpus doc and a held doc sharing an id value are never conflated.
    * Returns (corpus_id, held_id, jaccard) in the inputs' id type. At
    * scale the held side is typically tiny (benchmark suites), but
    * nothing assumes it: both sides ride the same banded shuffle, never
    * an all-pairs product.
    */
  def contamination(
      corpus: DataFrame, held: DataFrame, id: String, text: String,
      threshold: Double, numHashes: Int = 128, bands: Int = 32,
      shingleN: Int = 3): DataFrame = {
    // namespace the banding key by side ("c:"/"h:" + id) so overlapping
    // id spaces stay distinct; the original-typed id rides along for the
    // final projection
    val tagged = corpus
      .select(col(id).as("__oid"), col(text).as("__t"), lit(false).as("__held"))
      .unionByName(held
        .select(col(id).as("__oid"), col(text).as("__t"), lit(true).as("__held")))
      .withColumn("id", concat(
        when(col("__held"), lit("h:")).otherwise(lit("c:")),
        col("__oid").cast("string")))
    val pairs = minhashPairs(
      tagged, "id", "__t", threshold, numHashes, bands, shingleN)
    // re-attach the side tags with the corpus-sized tag projection on
    // the STREAM side and the pair frame on the build side, join choice
    // left to the planner: pairs are usually a handful (AQE's runtime
    // stats then convert to a broadcast join with local reads — no
    // corpus shuffle), but a heavily contaminated corpus can produce
    // O(corpus) pairs, and a forced broadcast hint would hard-fail or
    // OOM exactly in the case this scan exists to detect
    val tags = tagged.select(col("id"), col("__oid"), col("__held"))
    val withH1 = tags.select(
        col("id").as("id1"), col("__oid").as("oid1"), col("__held").as("h1"))
      .join(pairs, "id1")
    val full = tags.select(
        col("id").as("id2"), col("__oid").as("oid2"), col("__held").as("h2"))
      .join(withH1, "id2")
    full
      .where(col("h1") =!= col("h2"))
      .select(
        when(col("h1"), col("oid2")).otherwise(col("oid1")).as("corpus_id"),
        when(col("h1"), col("oid1")).otherwise(col("oid2")).as("held_id"),
        col("jaccard"))
  }

  /** Exact n-gram decontamination (the GPT-3 appendix-C method, Brown
    * et al. 2020: a training doc is contaminated when any of its word
    * n-grams occurs verbatim in the held-out/eval set) — the exact
    * complement of the MinHash [[contamination]] scan, which catches
    * NEAR-duplicate leakage this one cannot, while this one catches
    * single-quote leakage below any Jaccard threshold.
    *
    * Returns every train row: (id, n_overlap = distinct leaked n-grams
    * in the doc, contaminated). Docs with < n tokens have no n-grams
    * and report 0.
    *
    * Scale: the held-out side collapses to its DISTINCT gram set once;
    * train grams are per-doc distinct (no within-doc multiplicity
    * shuffles). The verdict join runs on the gram key — benchmarks are
    * MB-sized against a 100 TB corpus, so `broadcastHeld = true` turns
    * it into a map-side semi-join with zero corpus shuffle; the default
    * stays a shuffle join because a LARGE held set force-broadcast
    * would OOM exactly when this scan matters most.
    */
  /** Per-doc distinct word n-grams — THE definition of a contaminating
    * n-gram, shared by [[ngramContamination]] (which train docs to
    * drop) and [[contaminationFraction]] (how dirty each eval item is):
    * one copy, so a tokenization/normalization change can never make
    * the two halves of the decontamination story disagree. Stages the
    * token array in its own projection (HOF lambda over a column
    * reference, not an inline re-split per element); `keep` columns are
    * aliased in the FIRST projection, then referenced by their output
    * names downstream.
    */
  private def distinctNgrams(df: DataFrame, text: String, n: Int,
      keep: Seq[Column]): DataFrame = {
    val toks =
      df.select(keep :+ split(lower(trim(col(text))), "\\s+").as("__ts"): _*)
    val keepNames = toks.columns.dropRight(1).map(col)
    toks
      .where(size(col("__ts")) >= n)
      .select(keepNames :+ explode(array_distinct(transform(
        sequence(lit(0), size(col("__ts")) - n),
        i => concat_ws(" ", slice(col("__ts"), i + lit(1), lit(n)))))).as("g"): _*)
  }

  def ngramContamination(
      train: DataFrame, held: DataFrame, id: String, text: String,
      n: Int = 8, broadcastHeld: Boolean = false): DataFrame = {
    def grams(df: DataFrame, keep: Seq[Column]): DataFrame =
      distinctNgrams(df, text, n, keep)
    val heldGrams = grams(held, Nil).select(col("g")).distinct()
    val rightSide = if (broadcastHeld) broadcast(heldGrams) else heldGrams
    val counts = grams(train, Seq(col(id).as("id")))
      .join(rightSide, "g")
      .groupBy(col("id")).agg(count(lit(1)).as("n_overlap"))
    train.select(col(id).as("id"))
      .join(counts, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }

  /** Eval-side contamination REPORT — the number benchmark cards
    * actually publish: for each held-out/eval document, the fraction of
    * its distinct word n-grams that occur anywhere in the training
    * corpus. [[ngramContamination]] answers "which TRAIN docs must I
    * drop"; this answers "how dirty is each EVAL item" (and an eval
    * set is kept or thrown out on that fraction, per GPT-3 appendix C /
    * PaLM's dataset-contamination analyses).
    *
    * Returns every held row: (id, n_grams = distinct n-grams in the
    * doc, n_dirty = how many of them appear in train, frac = n_dirty /
    * n_grams rounded to 4 decimals, 0.0 for docs shorter than n
    * tokens).
    *
    * Scale: the TRAIN side — the 100 TB one — collapses to its
    * distinct gram set via one map-side-combining aggregate and is
    * never carried per-document; the held side (benchmark-sized)
    * shuffles only its own grams. The verdict join is gram-keyed
    * train-distinct × held-distinct, then one held-id aggregate.
    */
  def contaminationFraction(
      train: DataFrame, held: DataFrame, id: String, text: String,
      n: Int = 8): DataFrame = {
    val trainGrams = distinctNgrams(train, text, n, Nil)
      .select(col("g")).distinct()
    val counts = distinctNgrams(held, text, n, Seq(col(id).as("id")))
      .join(trainGrams.withColumn("__hit", lit(1)), Seq("g"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).as("n_dirty"))
    held.select(col(id).as("id"))
      .join(counts, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dirty"), lit(0L)).as("n_dirty"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("n_dirty") / col("n_grams"), 4))
          .as("frac"))
  }

  /** Capped distinct-vocabulary probe: a typed aggregate whose state
    * stops growing at 65 tokens, so the probe is ONE map-side-combining
    * pass with ≤ 65-entry partials — it never shuffles a large
    * vocabulary only to discard it (the merge keeps adding until the
    * cap, so a final size < 65 proves the vocabulary is complete).
    * Returns None when the vocabulary exceeds 64 tokens.
    */
  private[dedup] def probeVocab(
      docs: DataFrame, text: String): Option[Array[String]] = {
    val words = widen(docs).select(
      explode(array_distinct(split(lower(col(text)), "\\s+"))).as("w"))
    val capped = udaf(new CappedVocab(65))
    val v = words.agg(capped(col("w")).as("v")).head().getSeq[String](0)
    if (v.length <= 64) Some(v.toArray) else None
  }

  private final class CappedVocab(cap: Int)
      extends Aggregator[String, Array[String], Array[String]] {
    def zero: Array[String] = Array.empty
    def reduce(b: Array[String], w: String): Array[String] =
      if (b.length >= cap || b.contains(w)) b else b :+ w
    def merge(a: Array[String], b: Array[String]): Array[String] = {
      var m = a
      b.foreach(w => if (m.length < cap && !m.contains(w)) m = m :+ w)
      m
    }
    def finish(b: Array[String]): Array[String] = b
    def bufferEncoder: Encoder[Array[String]] =
      ExpressionEncoder[Array[String]]()
    def outputEncoder: Encoder[Array[String]] =
      ExpressionEncoder[Array[String]]()
  }

  /** EXACT word-set Jaccard pairs for corpora whose distinct vocabulary
    * fits in 64 tokens: each doc's token set packs into ONE 64-bit mask,
    * so intersection and union sizes are two popcounts and the candidate
    * space collapses from Σ df² token collisions to pairs of DISTINCT
    * masks (exact-duplicate docs share a mask and are compared once).
    * No token self-join, no shuffle fanout: the mask projection is
    * narrow, the mask-pair comparison is a broadcast nested-loop over
    * the ≤ 2⁶⁴ (in practice ≤ corpus-distinct) mask table, and the only
    * shuffles left are the expansion joins whose size is the OUTPUT
    * pair count. On the 31-token bench corpus this replaces ~620M joined
    * token rows with ~m²/2 popcount comparisons (m = distinct sets).
    *
    * Same contract as [[jaccardPairs]]: (id1 < id2, jaccard ≥ threshold),
    * bit-identical jaccard doubles (integer-ratio division both ways).
    *
    * A corpus whose vocabulary exceeds 64 tokens fails fast with
    * IllegalArgumentException — use [[jaccardPairsAuto]] to fall back to
    * the inverted index instead.
    */
  def jaccardPairsBitset(
      docs: DataFrame, id: String, text: String,
      threshold: Double): DataFrame =
    bitsetPairs(docs, id, text, threshold,
      probeVocab(docs, text).getOrElse(throw new IllegalArgumentException(
        "jaccardPairsBitset: vocabulary exceeds 64 distinct tokens — " +
          "use jaccardPairs/jaccardPairsAuto for general corpora")))

  private def bitsetPairs(
      docs: DataFrame, id: String, text: String,
      threshold: Double, vocab: Array[String]): DataFrame = {
    def pc(c: Column): Column = bit_count(c)
    bitsetPairsScored(docs, id, text, threshold, vocab, "jaccard",
      (mx, my) => pc(mx.bitwiseAND(my)) / pc(mx.bitwiseOR(my)),
      // symmetric size filter: J ≥ t needs min(sz) ≥ ⌈t·max(sz)⌉
      (mx, my) => least(pc(mx), pc(my)) >=
        tceil(threshold, greatest(pc(mx), pc(my))))
  }

  /** The shared ≤64-token-vocabulary engine: docs collapse to 64-bit
    * masks, DISTINCT masks pair under a cheap popcount predicate, and
    * qualifying mask pairs expand back to doc pairs — cost m² cheap
    * comparisons + output-sized expansion, independent of corpus size
    * beyond the mask projection. `score`/`prefilter` parameterize the
    * relation (jaccard's symmetric ratio + size filter, containment's
    * asymmetric min-ratio with no sound prefilter).
    */
  private def bitsetPairsScored(
      docs: DataFrame, id: String, text: String,
      threshold: Double, vocab: Array[String], scoreName: String,
      score: (Column, Column) => Column,
      prefilter: (Column, Column) => Column): DataFrame = {
    val sets = widen(docs).select(col(id).as("id"),
      array_distinct(split(lower(col(text)), "\\s+")).as("ts"))
    // token → bit map inlined as a literal (≤ 64 entries); element_at
    // under ANSI mode errors on a token absent from the probe, which is
    // exactly right — it means the input changed between probe and run
    val bitOf = map(vocab.sorted.zipWithIndex.flatMap {
      case (w, i) => Seq(lit(w), lit(1L << i))
    }.toIndexedSeq: _*)
    // narrow per-doc fold — no groupBy shuffle; ≤ 64 iterations per doc
    val masks = sets.select(col("id"),
      aggregate(col("ts"), lit(0L),
        (acc, w) => acc.bitwiseOR(element_at(bitOf, w))).as("mask"))
    val dm = masks.select(col("mask")).distinct()
    // m×m popcount comparisons under the relation's prefilter; the
    // score double is the same integer ratio the inverted index emits
    val cross = dm.as("x").join(broadcast(dm.as("y")),
        col("x.mask") < col("y.mask") &&
          prefilter(col("x.mask"), col("y.mask")))
      .select(col("x.mask").as("m1"), col("y.mask").as("m2"),
        score(col("x.mask"), col("y.mask")).as(scoreName))
      .where(col(scoreName) >= threshold)
    // docs sharing a mask are exact set-duplicates: score 1.0 for any
    // intersection-over-(union|min) relation, compare once
    val same = dm.select(col("mask").as("m1"), col("mask").as("m2"),
        lit(1.0).as(scoreName))
      .where(lit(1.0) >= threshold)
    val mp = cross.unionByName(same)
    // expansion joins: sized by the qualifying OUTPUT pairs, nothing more.
    // Same-mask pairs keep x.id < y.id (each unordered pair once);
    // cross-mask ids can't collide, least/greatest just normalizes order.
    masks.as("x")
      .join(broadcast(mp), col("x.mask") === col("m1"))
      .join(masks.as("y"), col("y.mask") === col("m2") &&
        (col("m1") =!= col("m2") || col("x.id") < col("y.id")))
      .select(least(col("x.id"), col("y.id")).as("id1"),
        greatest(col("x.id"), col("y.id")).as("id2"), col(scoreName))
  }

  /** Adaptive exact-Jaccard: probe the vocabulary (capped aggregate, one
    * cheap pass) and take the bitset path when it fits in 64 bits, the
    * inverted index otherwise — an AQE-style runtime algorithm choice.
    * Options that only parameterize the inverted index (df cap, salt)
    * force the general path.
    */
  def jaccardPairsAuto(
      docs: DataFrame, id: String, text: String,
      threshold: Double, maxDf: Option[Long] = None,
      salt: Int = 1): DataFrame =
    (if (maxDf.isEmpty && salt == 1) probeVocab(docs, text) else None) match {
      case Some(vocab) => bitsetPairs(docs, id, text, threshold, vocab)
      case None => jaccardPairs(docs, id, text, threshold, maxDf, salt)
    }

  /** Bitset containment over a ≤64-token vocabulary: the
    * [[bitsetPairsScored]] engine with the asymmetric |∩|/min score.
    * NO prefilter — containment is precisely the relation where a tiny
    * mask may fully match a huge one (module doc on [[containmentPairs]]),
    * so every distinct-mask pair is scored; still m² CHEAP popcounts
    * over distinct masks, not doc pairs.
    */
  private[dedup] def containmentPairsBitset(
      docs: DataFrame, id: String, text: String,
      threshold: Double, vocab: Array[String]): DataFrame = {
    def pc(c: Column): Column = bit_count(c)
    bitsetPairsScored(docs, id, text, threshold, vocab, "containment",
      (mx, my) => pc(mx.bitwiseAND(my)) / least(pc(mx), pc(my)),
      (_, _) => lit(true))
  }

  /** Adaptive containment, mirroring [[jaccardPairsAuto]]: bitset masks
    * when the vocabulary fits in 64 bits, the counted inverted index
    * otherwise. A df cap forces the general path (the cap changes the
    * relation, and the bitset form can't express it).
    */
  def containmentPairsAuto(
      docs: DataFrame, id: String, text: String,
      threshold: Double, maxDf: Option[Long] = None,
      salt: Int = 1): DataFrame =
    (if (maxDf.isEmpty && salt == 1) probeVocab(docs, text) else None) match {
      case Some(vocab) =>
        containmentPairsBitset(docs, id, text, threshold, vocab)
      case None => containmentPairs(docs, id, text, threshold, maxDf, salt)
    }

  /** EXACT Jaccard pairs via prefix-filtered candidate generation (the
    * All-Pairs/PPJoin scheme — Bayardo et al. WWW'07, Xiao et al. WWW'08):
    * order tokens globally by document frequency (rarest first), keep only
    * each doc's first `|d| − ⌈t·|d|⌉ + 1` tokens as its PREFIX, generate
    * candidates from prefix-token collisions + the symmetric size filter,
    * then verify each candidate against the full sorted token sets. Any
    * pair with J ≥ t provably shares a prefix token on both sides, so the
    * candidate set is complete.
    *
    * The scale profile is the mirror image of [[jaccardPairs]]: candidate
    * generation collides only on rare tokens (orders of magnitude below
    * Σ df² under stopword skew), but verification ships two full token
    * arrays per candidate — so this wins when qualifying pairs are rare
    * (web-scale dedup) and loses when the corpus is dup-dense.
    */
  def jaccardPairsPrefix(
      docs: DataFrame, id: String, text: String,
      threshold: Double, maxDf: Option[Long] = None): DataFrame =
    prefixPairsFromTokens(tokensWithSize(docs, id, text, maxDf), threshold)

  /** [[jaccardPairsPrefix]] over char n-grams — the scale path for a
    * CORPUS-RELATIVE df cap on the n-gram domain: the counted inverted
    * index's work is Σ df² over every admitted gram (Θ(corpus²) when
    * the cap scales with the corpus — even decomposed into bounded
    * cells the total stands, measured exponent 1.36), while prefix
    * filtering collides only each doc's ~(1−t)·|d| RAREST grams, whose
    * df is small by construction — the hot grams that dominate Σ df²
    * sort to the back of every doc and never generate a candidate.
    * Same exact results (the oracle-checked parity), dup-sparse-linear
    * cost.
    */
  def ngramJaccardPairsPrefix(
      docs: DataFrame, id: String, text: String, n: Int,
      threshold: Double, maxDf: Option[Long] = None): DataFrame = {
    val sets = widen(docs)
      .select(col(id).as("id"), lower(col(text)).as("__t"))
      .select(col("id"), charShinglesOfLower(col("__t"), n).as("ts"))
    prefixPairsFromTokens(withSizes(sets, maxDf), threshold)
  }

  private def prefixPairsFromTokens(
      words: DataFrame, threshold: Double): DataFrame = {
    val dfs = words.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("id"))
      .orderBy(col("df").asc, col("w").asc)
    // materialized: the df-census join + per-doc rarity window would
    // otherwise execute on BOTH legs of the candidate self-join
    val prefix = words.join(dfs, "w")
      .withColumn("pos", row_number().over(byRarity))
      .where(col("pos") <= col("sz") - tceil(threshold, col("sz")) + 1)
      .select(col("id"), col("w"), col("sz"), col("pos"))
      .localCheckpoint()
    // ASYMMETRIC prefixes (the PPJoin index/probe split): the smaller
    // doc of a qualifying pair needs only its SHORT prefix
    // |d| − ⌈2t/(1+t)·|d|⌉ + 1 to be guaranteed a collision — for
    // J ≥ t with |x| ≤ |y| the overlap is ≥ 2t/(1+t)·|x| (and
    // ≥ t·|y| via the size filter), so the prefix lemma lands a shared
    // token inside short(x) × long(y). Joining short×long instead of
    // long×long cuts the collision fanout ~(1−t)/(1+t) ÷ (1−t) =
    // 1/(1+t) per side with zero completeness loss; each unordered
    // pair meets in exactly one orientation (smaller set on the short
    // leg, id tie-break at equal sizes).
    val short = prefix.where(
      col("pos") <= col("sz") -
        tceil(2 * threshold / (1 + threshold), col("sz")) + 1)
    val cand = short.as("a").join(prefix.as("b"),
        col("a.w") === col("b.w") &&
          (col("a.sz") < col("b.sz") ||
            (col("a.sz") === col("b.sz") && col("a.id") < col("b.id"))) &&
          col("a.sz") >= tceil(threshold, col("b.sz")))
      .select(least(col("a.id"), col("b.id")).as("id1"),
        greatest(col("a.id"), col("b.id")).as("id2"))
      .distinct()
    val sets = words.groupBy(col("id"))
      .agg(sort_array(collect_list(col("w"))).as("set"),
        first(col("sz")).as("sz"))
    cand
      .join(sets.select(col("id").as("id1"), col("set").as("set1"),
        col("sz").as("sz1")), "id1")
      .join(sets.select(col("id").as("id2"), col("set").as("set2"),
        col("sz").as("sz2")), "id2")
      .withColumn("inter", size(array_intersect(col("set1"), col("set2"))))
      .withColumn("jaccard",
        col("inter") / (col("sz1") + col("sz2") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Typed min-signature aggregator: buffer = Array[Long] of running
    * minima, one per hash function. Bit-identical to per-column
    * `min(xxhash64(lit(i), base))` aggregates (same seed chaining:
    * `xxhash64(a, b)` = `hashLong(b, hashLong(a, 42))`), but 128 separate
    * min() buffers knock the aggregate out of JIT-able codegen; this is
    * two tight JVM loops with map-side combine — the shuffle carries one
    * 128-long array per doc per partition.
    */
  private final class MinSig(numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    private val seeds: Array[Long] =
      Array.tabulate(numHashes)(i => XXH64.hashLong(i.toLong, 42L))
    def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)
    def reduce(buf: Array[Long], base: Long): Array[Long] = {
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(base, seeds(i))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Default cap on the members of one LSH bucket a single task may
    * self-join: a bucket of n members costs O(n²) pair checks on ONE
    * join key (band, bh) — unsplittable by AQE — so a
    * duplicate-saturated corpus (thousands of byte-identical docs share
    * every band hash) turns into a single straggler task. Buckets past
    * the cap are decomposed (see [[minhashCandidates]]).
    */
  val DefaultMaxBucketSize = 1024

  /** (id, band, bh) band rows of the minhash signature — the bucketing
    * frame [[minhashCandidates]] self-joins. Exposed for spec-level
    * verification of the bucket decomposition.
    */
  private[dedup] def bandedSignatures(
      docs: DataFrame, id: String, text: String,
      numHashes: Int, bands: Int, shingleN: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // one string hash per shingle, then numHashes seeded hashes of that
    // 8-byte base value — each behaves as an independent permutation for
    // min-hashing at a fraction of the cost of re-hashing the string
    // (and no overflowing arithmetic, which ANSI mode would reject)
    val sh = widen(docs)
      .select(col(id).as("id"), split(lower(col(text)), "\\s+").as("__w"))
      .select(col("id"), explode(shinglesOfTokens(col("__w"), shingleN)).as("sh"))
      .withColumn("base", xxhash64(col("sh")))
    val minsig = udaf(new MinSig(numHashes))
    val sig = sh.groupBy(col("id")).agg(minsig(col("base")).as("sig"))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rows until (b + 1) * rows)
          .map(i => col("sig").getItem(i)): _*).as("bh"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  /** The (x, y) legs of the bucket self-join, decomposed so no join key
    * carries more than ~`maxBucketSize` members per side: each bucket of
    * n members splits into g = ⌈n / maxBucketSize⌉ id-hash chunks, the
    * x leg replicates each member across the g columns of its chunk row
    * and the y leg across the g rows of its chunk column, and the join
    * key becomes (band, bh, cx, cy) — a pair (a, b) meets in EXACTLY the
    * (chunk(a), chunk(b)) cell, so candidate parity with the unsalted
    * join is exact while every cell is an independent, boundable key.
    * Normal buckets have g = 1: one cell, zero replication — the salt is
    * free until a bucket actually overflows.
    */
  private[dedup] def saltedBandLegs(
      banded: DataFrame, maxBucketSize: Int): (DataFrame, DataFrame) = {
    require(maxBucketSize > 0, "maxBucketSize must be positive")
    // census only the OVERSIZED buckets: the aggregate shuffles slim
    // (band, bh) rows with map-side combine, and the surviving list is
    // empty for any non-degenerate corpus — AQE then makes the re-join
    // a broadcast and normal corpora pay ~nothing for the guard (a
    // window count here would shuffle the full banded frame instead)
    val over = banded.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("__n")).where(col("__n") > maxBucketSize)
      .select(col("band"), col("bh"),
        ceil(col("__n") / lit(maxBucketSize)).cast("int").as("__g"))
    // materialized: both self-join legs read the g-annotated rows from
    // storage instead of re-executing the census join per leg
    val withG = banded.join(over, Seq("band", "bh"), "left")
      .withColumn("g", coalesce(col("__g"), lit(1))).drop("__g")
      .localCheckpoint()
    val chunk = pmod(xxhash64(col("id")), col("g")).cast("int")
    val x = withG.withColumn("cx", chunk)
      .withColumn("cy", explode(sequence(lit(0), col("g") - 1)))
    val y = withG.withColumn("cy", chunk)
      .withColumn("cx", explode(sequence(lit(0), col("g") - 1)))
    (x.drop("g"), y.drop("g"))
  }

  /** Diagnostic census of the LSH buckets that exceed `maxBucketSize` —
    * the buckets [[saltedBandLegs]] would decompose into g×g join
    * cells. Empty for a healthy corpus; a populated result is the
    * operational signal of a duplicate-saturated (or degenerate-text)
    * slice, and `g` is the chunk fan-out each such bucket pays. One
    * slim (band, bh) aggregate — safe to run against the full corpus.
    */
  def oversizedBandBuckets(
      docs: DataFrame, id: String, text: String,
      numHashes: Int = 128, bands: Int = 32, shingleN: Int = 3,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    bandedSignatures(docs, id, text, numHashes, bands, shingleN)
      .groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("n")).where(col("n") > maxBucketSize)
      .select(col("band"), col("bh"), col("n"),
        ceil(col("n") / lit(maxBucketSize)).cast("int").as("g"))

  /** MinHash-LSH candidate pairs: deterministic seeded xxhash64 minhash
    * signatures over the shingle set, xor-banded into `bands` buckets of
    * `numHashes / bands` rows; docs colliding in any band become a
    * candidate pair. Deterministic across runs/retries (no RNG state).
    * Oversized buckets (> `maxBucketSize` members — duplicate-saturated
    * corpora) are decomposed into bounded join cells
    * ([[saltedBandLegs]]) so the O(n²) hot bucket never lands on one
    * unsplittable task.
    */
  def minhashCandidates(
      docs: DataFrame, id: String, text: String,
      numHashes: Int = 128, bands: Int = 32, shingleN: Int = 3,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    // materialized: the banded rows feed the oversize census AND the
    // annotation join's left side — without the cut the shingle explode
    // + MinSig signature aggregate execute twice
    val banded = bandedSignatures(docs, id, text, numHashes, bands, shingleN)
      .localCheckpoint()
    val (x, y) = saltedBandLegs(banded, maxBucketSize)
    x.as("x").join(y.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.cx") === col("y.cx") && col("x.cy") === col("y.cy") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
      .distinct()
  }

  /** MinHash-LSH near-dup detection with exact verification: LSH prunes
    * the pair space, then every candidate's true shingle Jaccard is
    * computed and thresholded — output contains no false positives, and
    * with bands=32/rows=4 the probability of missing a pair at
    * J ≥ 0.8 is (1 - 0.8⁴)³² ≈ 5·10⁻⁸ per pair.
    */
  def minhashPairs(
      docs: DataFrame, id: String, text: String, threshold: Double,
      numHashes: Int = 128, bands: Int = 32, shingleN: Int = 3,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val cands = minhashCandidates(docs, id, text, numHashes, bands, shingleN,
      maxBucketSize)
    // materialized: the shingle sets feed BOTH verify-join legs; token
    // staging keeps the shingle lambda from re-splitting per element
    val sets = widen(docs)
      .select(col(id).as("id"), split(lower(col(text)), "\\s+").as("__w"))
      .select(col("id"), shinglesOfTokens(col("__w"), shingleN).as("set"))
      .localCheckpoint()
    cands
      .join(sets.select(col("id").as("id1"), col("set").as("set1")), "id1")
      .join(sets.select(col("id").as("id2"), col("set").as("set2")), "id2")
      .withColumn("jaccard",
        size(array_intersect(col("set1"), col("set2"))) /
          size(array_union(col("set1"), col("set2"))))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  // ------------------------------------------------------------------
  // Persisted LSH index — incremental near-dup without re-banding
  // ------------------------------------------------------------------

  /** Build and persist the MinHash-LSH index of a corpus: the
    * (id, band, bh) band rows and the per-doc shingle sets, as two
    * parquet datasets under `path`. A daily-ingest pipeline pays the
    * corpus banding ONCE; each new batch then bands only its own docs
    * and joins the stored bands ([[incrementalMinhashPairs]]) — the
    * delta cost is O(batch), not O(corpus), which is the difference
    * between an hourly ingest and a daily re-crawl re-band at 100 TB.
    * Parameters (numHashes/bands/shingleN) must match between build and
    * query; they are recorded in a `params.json` sidecar and validated
    * on query so a drifted caller fails fast instead of silently
    * producing candidates from incompatible signatures.
    */
  def saveLshIndex(
      docs: DataFrame, id: String, text: String, path: String,
      numHashes: Int = 128, bands: Int = 32, shingleN: Int = 3): Unit = {
    bandedSignatures(docs, id, text, numHashes, bands, shingleN)
      .write.mode("overwrite").parquet(s"$path/bands")
    widen(docs)
      .select(col(id).as("id"), split(lower(col(text)), "\\s+").as("__w"))
      .select(col("id"), shinglesOfTokens(col("__w"), shingleN).as("set"))
      .write.mode("overwrite").parquet(s"$path/sets")
    val json = s"""{"numHashes":$numHashes,"bands":$bands,""" +
      s""""shingleN":$shingleN}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "params.json"), json)
  }

  /** Near-dup pairs of a NEW batch against a persisted index (plus
    * within-batch pairs): the batch is banded locally, cross candidates
    * come from an equi-join against the stored bands, within-batch
    * candidates from the usual bounded bucket self-join, and every
    * candidate verifies exactly against the stored / freshly-built
    * shingle sets — no false positives, same guarantees as
    * [[minhashPairs]] at O(batch + collisions) cost.
    *
    * The cross join inherits the big-bucket discipline: oversized INDEX
    * buckets (> `maxBucketSize` members on a hot (band, bh) key —
    * unsplittable by AQE) are chunked by id-hash and the batch side
    * replicates across the chunks, so a duplicate-saturated index never
    * turns one join key into a straggler; normal buckets have one chunk
    * and zero replication. Batch ids must be disjoint from indexed ids
    * (re-ingesting an id would pair it with itself); output is
    * (id1, id2, jaccard) with id1 < id2.
    */
  def incrementalMinhashPairs(
      spark: SparkSession, path: String, batch: DataFrame,
      id: String, text: String, threshold: Double,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val params = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(path, "params.json")))
    val (numHashes, bands, shingleN) = (params.get("numHashes").asInt,
      params.get("bands").asInt, params.get("shingleN").asInt)
    val idxBands = spark.read.parquet(s"$path/bands")
    val idxSets = spark.read.parquet(s"$path/sets")
    // materialized: batch bands feed the cross join AND the within-batch
    // bucket self-join; batch sets feed both verify legs
    val newBanded =
      bandedSignatures(batch, id, text, numHashes, bands, shingleN)
        .localCheckpoint()
    val newSets = widen(batch)
      .select(col(id).as("id"), split(lower(col(text)), "\\s+").as("__w"))
      .select(col("id"), shinglesOfTokens(col("__w"), shingleN).as("set"))
      .localCheckpoint()
    // census only the oversized index buckets (empty for a sane index —
    // AQE broadcasts the annotation); chunk the index side, replicate
    // the batch side across the chunks
    val over = idxBands.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("__n")).where(col("__n") > maxBucketSize)
      .select(col("band"), col("bh"),
        ceil(col("__n") / lit(maxBucketSize)).cast("int").as("__g"))
    val idxChunked = idxBands.join(over, Seq("band", "bh"), "left")
      .withColumn("cx", coalesce(
        pmod(xxhash64(col("id")), col("__g")).cast("int"), lit(0)))
      .drop("__n", "__g")
    val batchRep = newBanded.join(over, Seq("band", "bh"), "left")
      .withColumn("cx",
        explode(sequence(lit(0), coalesce(col("__g"), lit(1)) - 1)))
      .drop("__n", "__g")
    val crossCands = batchRep.as("x")
      .join(idxChunked.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.cx") === col("y.cx"))
      .select(col("x.id").as("nid"), col("y.id").as("iid")).distinct()
    // within-batch candidates ride the standard bounded decomposition
    val (wx, wy) = saltedBandLegs(newBanded, maxBucketSize)
    val withinCands = wx.as("x").join(wy.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.cx") === col("y.cx") && col("x.cy") === col("y.cy") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("nid"), col("y.id").as("iid")).distinct()
    def verified(cands: DataFrame, otherSets: DataFrame): DataFrame =
      cands
        .join(newSets.select(col("id").as("nid"), col("set").as("set1")),
          "nid")
        .join(otherSets.select(col("id").as("iid"), col("set").as("set2")),
          "iid")
        .withColumn("jaccard",
          size(array_intersect(col("set1"), col("set2"))) /
            size(array_union(col("set1"), col("set2"))))
        .where(col("jaccard") >= threshold)
        .select(least(col("nid"), col("iid")).as("id1"),
          greatest(col("nid"), col("iid")).as("id2"), col("jaccard"))
    verified(crossCands, idxSets).unionByName(verified(withinCands, newSets))
  }
}
