package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis signals for corpus curation: language ID, quality
  * scoring, token counting, fingerprinting. All pure column expressions —
  * codegen-friendly, no UDFs in the hot path, and every signal is
  * re-derivable in plain SQL for oracle verification.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count — the native byte-scan expression
    * ([[graft.functions.TokenCount]]) when the session registered
    * [[graft.GraftExtensions]], bit-identical to `size(tokens(text))`
    * (TokenCountSpec pins the parity) without materializing the token
    * array per row. Sessions WITHOUT the extension (a library user on a
    * plain SparkSession) transparently get the built-in HOF form — same
    * values, one array allocation per row more.
    */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) if s.catalog.functionExists(
          graft.functions.TokenCount.Name) =>
        graft.functions.TokenCount.tokenCountNative(text)
      case _ => size(tokens(text))
    }

  /** BPE-ish subword count: alpha runs, digit runs, and individual
    * punctuation marks each count as one piece — a cheap, deterministic
    * proxy for tokenizer cost accounting.
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Language markers: tiny high-frequency function-word sets per
    * language (n-gram/stopword heuristic — argmax of marker hits).
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "es" -> Seq("el", "los", "las", "y", "que", "una"),
    "fr" -> Seq("le", "les", "et", "dans", "une", "est"))

  private def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers: _*)))

  /** Language-ID heuristic: the language with the most marker-token hits;
    * ties break alphabetically; zero hits everywhere → "und".
    */
  def langId(text: Column): Column = {
    val scores = Markers.map { case (l, ms) => l -> markerHits(text, ms) }
    val byLang = scores.toMap
    val Seq(de, en, es, fr) =
      Seq("de", "en", "es", "fr").map(byLang): @unchecked
    when(de >= en && de >= es && de >= fr && de > 0, "de")
      .when(en >= es && en >= fr && en > 0, "en")
      .when(es >= fr && es > 0, "es")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Quality score in [0, 1]: length credit (saturates at 100 tokens) +
    * function-word density credit + punctuation-noise penalty. The exact
    * formula matters less than determinism — it is reproducible in SQL.
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val stopHits = markerHits(text, Markers.toMap.apply("en")).cast("double")
    val punct = (length(text) -
      length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("double")
    val lenCredit = least(lit(1.0), n / 100.0)
    val stopCredit = least(lit(1.0), stopHits / n * 5.0)
    val punctPenalty = lit(1.0) - punct / greatest(length(text).cast("double"), lit(1.0))
    val raw = lenCredit * 0.4 + stopCredit * 0.3 + punctPenalty * 0.3
    // NOT round(raw, 4): engines disagree on decimal-boundary doubles
    // (a raw score whose shortest decimal form is exactly …5 rounds up
    // under DuckDB's scaled-approximation rounding and down under
    // Spark's exact-binary-expansion rounding — observed at sf0.1).
    // floor(x·10⁴ + 0.5)/10⁴ is the same IEEE op sequence in any engine,
    // so the quantized score is bit-identical everywhere. Valid because
    // the score is non-negative.
    floor(raw * 10000.0 + lit(0.5)) / 10000.0
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key, stable under formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Overlapping token-window chunks of a document — the context-window
    * splitter behind RAG ingestion and long-document training prep.
    * Chunk i covers tokens [i·step, i·step + size) with
    * step = size − overlap; the chunk count is ⌈(n − overlap)/step⌉
    * (min 1, so every document yields at least one chunk). Pure column
    * expressions (sequence/transform/slice — codegen, no UDF), exactly
    * re-derivable in SQL. Returns array<string> of chunk texts; pair
    * with posexplode for the (doc, chunk_idx, chunk) child-table shape.
    */
  def chunks(text: Column, size: Int, overlap: Int): Column =
    chunksOfTokens(tokens(text), size, overlap)

  /** [[chunks]] over an already-tokenized array column. Operators should
    * stage the token array into its own projection and call this form:
    * an inline tokenizer inside the chunk lambda re-splits the text once
    * per CHUNK (higher-order functions block subexpression elimination),
    * which is quadratic for long documents.
    */
  def chunksOfTokens(ts: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    // the `size` param shadows functions.size — qualify the builtin
    val n = org.apache.spark.sql.functions.size(ts).cast("long")
    val k = greatest(lit(1L),
      ceil((n - overlap).cast("double") / step).cast("long"))
    transform(sequence(lit(0L), k - 1),
      i => concat_ws(" ", slice(ts, (i * step + 1).cast("int"), lit(size))))
  }

  /** Per-group ADAPTIVE length filter — the quantile twin of the
    * absolute token bounds in [[qualityRuleFlags]]: fixed thresholds
    * tuned on English prose misfire on other languages and domains
    * (CJK tokenizes shorter, code longer), so each group's keep-window
    * is its own [lo, hi] token-count quantile band. The bounds table is
    * group-keyed (model-sized → broadcast back, the robustScale
    * pattern); documents carry their bounds and an auditable `kept`
    * flag rather than silently vanishing. `kept` compares against the
    * ROUNDED bounds (4 decimals) so the decision is reproducible from
    * the report itself.
    */
  def adaptiveLengthFilter(docs: DataFrame, id: String, text: String,
      group: String, lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad quantile band [$lo, $hi]")
    val counted = docs.select(col(group), col(id),
      tokenCount(col(text)).cast("long").as("n_tokens"))
    val bounds = counted.groupBy(col(group))
      .agg(round(expr(s"percentile(n_tokens, $lo)"), 4).as("lo"),
        round(expr(s"percentile(n_tokens, $hi)"), 4).as("hi"))
      .withColumnRenamed(group, "__grp")
    // NULL-SAFE group join: a null-group slice (failed langid) is a
    // legitimate group with its own bounds — a plain equi-join would
    // silently drop those documents from the report. A null text has no
    // measurable length: kept = false explicitly, never a null flag.
    counted.join(broadcast(bounds), col(group) <=> col("__grp"))
      .select(col(group), col(id), col("n_tokens"), col("lo"), col("hi"),
        coalesce(col("n_tokens") >= col("lo") &&
          col("n_tokens") <= col("hi"), lit(false)).as("kept"))
  }

  /** Rule-based quality filter chain (the Gopher §A1 / C4 recipe: a
    * battery of cheap structural rules, each a named boolean, with the
    * keep decision their conjunction — kept AS FLAGS so curation can
    * audit which rule fired instead of silently losing documents).
    * Rules here: token count within bounds, mean word length within
    * bounds, text ends in terminal punctuation, symbol-to-word ratio
    * bounded (`#`/`…` spam), and at least `minStopwords` distinct
    * common stopwords present (gibberish/non-prose gate). One narrow
    * projection, pure column arithmetic, no UDF.
    */
  def qualityRuleFlags(docs: DataFrame, id: String, text: String,
      minTokens: Int = 10, maxTokens: Int = 10000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minStopwords: Int = 2): DataFrame = {
    val ts = tokens(col(text))
    val n = org.apache.spark.sql.functions.size(ts).cast("double")
    val meanLen = (length(regexp_replace(trim(col(text)), "\\s+", "")))
      .cast("double") / n
    val symbols = (length(col(text)) -
      length(regexp_replace(col(text), "[#…]", ""))).cast("double")
    val stops = Seq("the", "a", "of", "and", "to", "in").map(lit)
    val nStops = org.apache.spark.sql.functions.size(
      array_intersect(array_distinct(ts), array(stops: _*)))
    docs.select(col(id),
      (n >= minTokens && n <= maxTokens).as("ok_len"),
      (meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen)
        .as("ok_word_len"),
      trim(col(text)).rlike("[.!?]$").as("ok_terminal"),
      (symbols / n <= maxSymbolRatio).as("ok_symbols"),
      (nStops >= minStopwords).as("ok_stopwords"))
      .withColumn("keep",
        col("ok_len") && col("ok_word_len") && col("ok_terminal") &&
          col("ok_symbols") && col("ok_stopwords"))
  }

  /** Content-defined chunking (the FastCDC/rsync idea at token
    * altitude): a chunk boundary falls AFTER token i whenever the hash
    * of the last `window` tokens is ≡ 0 mod `divisor` — boundaries are
    * a pure function of LOCAL content, so an insertion early in a
    * document only re-chunks its neighborhood while fixed-width
    * chunking ([[chunksOfTokens]]) shifts every later window. That
    * stability is what makes chunk-level dedup/caching survive edits —
    * the storage-dedup trick applied to corpus chunking.
    *
    * Expected chunk length ≈ `divisor` tokens. The hash is md5 of the
    * space-joined window (16 bits used) — engine-portable like every
    * other hash convention here. Shape: boundary flags are per-row
    * array arithmetic; the exclusive running sum that numbers chunks is
    * a per-doc window (docs are many — the partition key is the doc);
    * reassembly groups on (doc, chunk). Output: (id, chunk_idx, chunk,
    * n_tokens), every doc covered, every token in exactly one chunk.
    */
  def contentChunks(docs: DataFrame, id: String, text: String,
      window: Int = 4, divisor: Int = 8): DataFrame = {
    require(window > 0 && divisor > 0, "window and divisor must be positive")
    val n = org.apache.spark.sql.functions.size(col("__ts"))
    val flagged = docs
      .select(col(id), tokens(col(text)).as("__ts"))
      .select(col(id), posexplode(transform(
        sequence(lit(0), n - 1),
        i => struct(
          element_at(col("__ts"), (i + 1).cast("int")).as("tok"),
          when(i >= window - 1,
            (pmod(conv(substring(md5(concat_ws(" ",
              slice(col("__ts"), (i - window + 2).cast("int"), lit(window)))),
              1, 4), 16, 10).cast("long"), lit(divisor.toLong)) === 0)
              .cast("int"))
            .otherwise(lit(0)).as("b"))))
        .as(Seq("pos", "s")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    flagged
      .select(col(id), col("pos"), col("s.tok").as("tok"), col("s.b").as("b"))
      .withColumn("chunk_idx",
        coalesce(sum(col("b")).over(w), lit(0L)).cast("int"))
      .groupBy(col(id), col("chunk_idx"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          p => p.getField("tok"))).as("chunk"),
        count(lit(1)).as("n_tokens"))
  }

  /** BM25 relevance of every document against a small query-term set —
    * the retrieval scorer behind relevance-based corpus filtering
    * ("keep documents that look like the target domain"). Postings are
    * restricted to the query's terms BEFORE any shuffle (an `isin`
    * filter on the exploded tokens), so the shuffled volume is the query
    * terms' postings, never the corpus vocabulary; document count and
    * average length ride one driver-sized aggregate. idf is quantized
    * to 9 decimals — `ln` bits can differ across engines by an ulp, and
    * quantization absorbs it (the kmeans mean contract) — and the final
    * score to 4, ranked descending with an id tiebreak.
    */
  def bm25TopK(
      docs: DataFrame, id: String, text: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && k > 0, "terms and k must be non-empty/positive")
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n"),
      avg(tokenCount(col(text)).cast("double")).as("avgdl")).head()
    val n = stats.getDouble(0)
    // empty corpus: avg is null — return zero rows with the output
    // schema instead of an unboxing NPE (a filtering pipeline may
    // legitimately hand this an empty partition)
    if (stats.isNullAt(1))
      return docs.sparkSession.emptyDataFrame
        .select(lit(null).cast(docs.schema(id).dataType).as(id),
          lit(null).cast("int").as("rank"),
          lit(null).cast("double").as("score"))
    val avgdl = stats.getDouble(1)
    val toks = docs
      .select(col(id), tokenCount(col(text)).cast("double").as("dl"),
        explode(tokens(col(text))).as("w"))
      .where(col("w").isin(terms: _*))
    val tf = toks.groupBy(col(id), col("dl"), col("w"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val idf = tf.groupBy(col("w"))
      .agg(countDistinct(col(id)).cast("double").as("df"))
      .withColumn("idf",
        round(log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 9))
      .select(col("w"), col("idf"))
    // top-k via orderBy+limit (TakeOrderedAndProject — per-partition
    // heaps, never a global sort); the rank window then runs over only
    // the k survivors
    val top = tf.join(broadcast(idf), "w")
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
      .groupBy(col(id))
      .agg(round(sum(col("contrib")), 4).as("score"))
      .orderBy(col("score").desc, col(id).asc)
      .limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col(id).asc)))
      .select(col(id), col("rank").cast("int").as("rank"), col("score"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1) — the
    * quality filter that catches degenerate, loopy generations before
    * they enter a training mix:
    *   - `top_unigram_frac`: occurrences of the single most frequent
    *     token / total tokens (a high value means the doc is dominated
    *     by one word);
    *   - `dup_trigram_frac`: 1 − distinct/total over the doc's sliding
    *     token trigrams (a high value means the doc repeats itself).
    * The trigram fraction is pure array arithmetic per row (codegen, no
    * shuffle — `array_distinct` never leaves the task). The unigram mode
    * needs a per-(doc, token) count, which is one explode + two-stage
    * hash aggregate keyed by (id, token) — map-side combine bounds the
    * shuffle at the doc's distinct vocabulary, never its length — joined
    * back on id. An `aggregate`-HOF mode would avoid the shuffle but
    * costs O(len · vocab) per row: a single pathological 100k-token doc
    * would stall its task, so the explode is the scale-safe altitude.
    * Both fractions use the engine-stable floor quantization
    * ([[qualityScore]]). Output: (id, n_tokens, top_unigram_frac,
    * dup_trigram_frac).
    */
  def repetitionSignals(docs: DataFrame, id: String, text: String): DataFrame = {
    val q4 = (c: Column) => floor(c * 10000.0 + lit(0.5)) / 10000.0
    // STAGED projections: inlining the tokenizer into the trigram lambda
    // would re-run split() once per ELEMENT (higher-order functions block
    // subexpression elimination), turning a 54-token doc into ~54 splits —
    // measured 6.1 s → 0.6 s at sf0.1. Each stage materializes its array
    // once per row; later stages slice a column reference.
    val ts = col("__ts")
    val base = docs
      .select(col(id), tokens(col(text)).as("__ts"))
      .select(col(id), size(ts).cast("int").as("n_tokens"),
        when(size(ts) >= 3,
          transform(sequence(lit(1), size(ts) - 2),
            i => concat_ws(" ", slice(ts, i, lit(3)))))
          .otherwise(array().cast("array<string>")).as("__tg"))
      .select(col(id), col("n_tokens"),
        when(size(col("__tg")) >= 1,
          q4(lit(1.0) - size(array_distinct(col("__tg"))).cast("double") /
            size(col("__tg")).cast("double")))
          .otherwise(0.0).as("dup_trigram_frac"))
    val top = docs.select(col(id), explode(tokens(col(text))).as("w"))
      .groupBy(col(id), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col(id))
      .agg(q4(max(col("c")).cast("double") / sum(col("c")).cast("double"))
        .as("top_unigram_frac"))
    base.join(top, Seq(id))
      .select(col(id), col("n_tokens"), col("top_unigram_frac"),
        col("dup_trigram_frac"))
  }

  /** Distributed sequence packing for LLM training: documents are packed
    * in deterministic id order into fixed token-budget training rows
    * (the concat-and-chunk shape). The corpus splits into `groups`
    * independent pack groups (`id % groups`), each packed in parallel —
    * a single global cumulative sum would serialize the corpus through
    * ONE window partition, while per-group packing scales with executors
    * and costs at most one under-filled tail sequence per group. Within
    * a group a document's sequence is ⌊exclusive-cumsum / maxTokens⌋ —
    * pure window arithmetic, re-derivable in SQL for the oracle. Returns
    * one row per packed sequence: (grp, seq, n_docs, n_tokens); n_tokens
    * may overhang maxTokens by the boundary doc's tail, which the
    * trainer's truncation handles (standard packing semantics).
    */
  def packSequences(
      df: DataFrame, id: String, text: String,
      maxTokens: Int, groups: Int): DataFrame = {
    require(maxTokens > 0 && groups > 0, "maxTokens and groups must be > 0")
    val w = Window.partitionBy(col("grp")).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(id), (col(id) % groups).as("grp"),
        tokenCount(col(text)).cast("long").as("toks"))
      .withColumn("cum", coalesce(sum(col("toks")).over(w), lit(0L)))
      .withColumn("seq", floor(col("cum") / maxTokens))
      .groupBy(col("grp"), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
  }

  /** C4-style boilerplate-line removal: census every line across the
    * corpus, strip lines appearing in ≥ `minDocs` distinct documents
    * (navigation chrome, cookie banners, copyright footers), and
    * reassemble each document in original line order. Documents whose
    * every line is boilerplate drop out.
    *
    * The census shuffles (doc, line) pairs once and keeps only the
    * over-threshold survivors — by definition the small set of
    * repeated chrome strings — which then broadcast into an ANTI join,
    * so the corpus-sized line stream never shuffles again.
    * Reassembly is array_sort-by-position inside one aggregate (no
    * window). At an extreme corpus where even the censused boilerplate
    * set outgrows a broadcast, drop the hint and let AQE pick the
    * join; the threshold semantics are unchanged.
    */
  /** Vocabulary coverage curve: for each requested vocabulary size k,
    * the fraction of all corpus tokens covered by the k most frequent
    * words (freq desc, word asc tie-break) — the Zipf diagnostic behind
    * choosing a tokenizer vocab size / estimating the OOV rate a fixed
    * vocabulary would incur.
    *
    * Scale shape: the corpus collapses to the word-frequency table in
    * one map-side-combined pass; the ranked head is a TakeOrdered of
    * max(ks) rows (distributed top-k — never a global sort or a
    * corpus-wide window), and the row_number window then runs over that
    * ≤max(ks)-row head. Output is |ks| rows.
    */
  def vocabCoverage(
      docs: DataFrame, text: String, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), "ks must be positive")
    val spark = docs.sparkSession
    val counts = docs
      .select(explode(tokens(col(text))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("total_tokens"))
    val head = counts
      .orderBy(col("c").desc, col("w"))
      .limit(ks.max)
      .withColumn("rn",
        row_number().over(Window.orderBy(col("c").desc, col("w"))))
    val ksDf = spark.createDataFrame(
      ks.sorted.map(Tuple1(_))).toDF("k")
    val q4 = (c: Column) => floor(c * 10000.0 + lit(0.5)) / 10000.0
    head.crossJoin(broadcast(ksDf))
      .groupBy(col("k"))
      .agg(sum(when(col("rn") <= col("k"), col("c")).otherwise(lit(0L)))
        .as("covered_tokens"))
      .crossJoin(broadcast(total))
      .select(
        col("k"), col("covered_tokens"), col("total_tokens"),
        q4(col("covered_tokens").cast("double") / col("total_tokens"))
          .as("coverage"))
  }

  def stripBoilerplateLines(docs: DataFrame, id: String, text: String,
      minDocs: Int, sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = docs.select(col(id),
      posexplode(split(col(text), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val boiler = lines.select(col(id), col("line")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("ndocs"))
      .where(col("ndocs") >= minDocs)
      .select(col("line"))
    val kept = lines.join(broadcast(boiler), Seq("line"), "left_anti")
    kept.groupBy(col(id))
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(pos, line))), x -> x.line)"),
        sep).as("clean"))
  }

  /** Exact phrase search via positional postings — the multi-token
    * matching BM25's bag-of-words scoring cannot express (code
    * identifiers, named entities, quoted spans). Postings are pruned
    * to the phrase's terms BEFORE any shuffle (the BM25 lesson) and
    * materialized once; each subsequent term then joins on the
    * (id, adjusted-position) key — k−1 keyed joins of term-sized
    * streams, never a corpus scan per term. Returns (id, n_matches)
    * for documents containing the phrase at least once.
    */
  def phraseSearch(docs: DataFrame, id: String, text: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val posts = docs
      .select(col(id), posexplode(tokens(col(text))).as(Seq("pos", "w")))
      .where(col("w").isin(phrase.distinct: _*))
      .localCheckpoint()
    val anchor = posts.where(col("w") === phrase.head)
      .select(col(id), col("pos"))
    val matches = phrase.zipWithIndex.drop(1)
      .foldLeft(anchor) { case (acc, (t, i)) =>
        acc.join(posts.where(col("w") === t)
          .select(col(id), (col("pos") - i).as("pos")), Seq(id, "pos"))
      }
    matches.groupBy(col(id)).agg(count(lit(1)).as("n_matches"))
  }

  /** Top-k characteristic terms per group by TF-IDF — "what makes this
    * domain/source distinctive" (corpus exploration, mixture design,
    * boilerplate spotting). tf is a (group, term) hash aggregate; df
    * counts groups per term over tf's already-distinct pairs
    * (vocabulary-sized, never a second corpus pass); the group count is
    * one scalar. The per-group ranking reuses the two-phase salted
    * top-k so a handful of coarse groups never serializes the
    * vocabulary through single window tasks. idf = ln(G/df) quantized
    * to 9 decimals, score to 4 (the BM25 convention).
    */
  def tfidfTopTerms(docs: DataFrame, group: String, text: String,
      k: Int, salts: Int = 64): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = docs.select(col(group), explode(tokens(col(text))).as("w"))
    val tf = toks.groupBy(col(group), col("w")).agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val g = tf.select(col(group)).distinct().count()
    val scored = tf.join(dfs, "w")
      .withColumn("score",
        round(col("tf") * round(log(lit(g.toDouble) / col("df")), 9), 4))
    graft.operators.Salted.topKPerGroup(scored, Seq(group),
        Seq(col("score").desc, col("w").asc), k, salts,
        saltCols = Seq(col("w")))
      .select(col(group), col("rk"), col("w"), col("tf"), col("score"))
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022 — the FIM
    * pretraining objective for code/infilling models): each document's
    * token stream splits into deterministic thirds and re-serializes in
    * PSM order, `<PRE>prefix<SUF>suffix<MID>middle`, together with the
    * half-open CHAR span [mid_s, mid_e) of the middle inside the
    * transformed string — the range an infilling trainer scores. Same
    * span discipline as [[Chat.renderWithLossSpans]]: an off-by-one
    * trains on the sentinel tokens, which is exactly what a span-exact
    * oracle catches. Case is preserved (this is a pretraining
    * transform, not an analysis pass); whitespace normalizes to single
    * spaces — the token-altitude convention of [[chunks]]/
    * [[packSequences]]. Pure per-row array arithmetic: no shuffle, no
    * window, scales as a map pass.
    */
  def fimTransform(docs: DataFrame, id: String, text: String): DataFrame = {
    val n = size(col("__ts"))
    val p = floor(n / 3).cast("int")
    val m = floor(n * 2 / 3).cast("int")
    docs
      .select(col(id), split(trim(col(text)), "\\s+").as("__ts"))
      .select(col(id), n.as("n_tokens"),
        concat_ws(" ", slice(col("__ts"), lit(1), p)).as("__pre"),
        concat_ws(" ", slice(col("__ts"), p + 1, m - p)).as("__mid"),
        concat_ws(" ", slice(col("__ts"), m + 1, n - m)).as("__suf"))
      .select(col(id), col("n_tokens"),
        concat(lit("<PRE>"), col("__pre"), lit("<SUF>"), col("__suf"),
          lit("<MID>"), col("__mid")).as("text_fim"),
        (length(col("__pre")) + length(col("__suf")) + lit(15))
          .as("mid_s"),
        (length(col("__pre")) + length(col("__suf")) + lit(15) +
          length(col("__mid"))).as("mid_e"))
  }

  /** Per-document character entropy (bits/char) — the Gopher-style
    * quality rule the length/punctuation ratios miss: binary blobs,
    * base64 runs, and key-mash spam sit HIGH (near log₂ alphabet),
    * while single-char floods and padding sit near 0; natural prose
    * occupies a stable mid band per language. Output per document:
    * `n_chars` (non-empty character count) and `entropy` =
    * log₂ n − (Σ c·log₂ c)/n over the char histogram, rounded 6, with
    * per-char terms quantized to 9 before the fold so the engine and
    * oracle sum order can't drift. Empty documents report (0, 0.0).
    *
    * Scale shape: one (doc, char) hash aggregate (map-side combined —
    * the shuffle carries histogram cells, ≤ alphabet per doc, not
    * characters) and a doc-keyed fold; the join back rides the same
    * doc partitioning.
    */
  def charEntropy(docs: DataFrame, id: String, text: String): DataFrame = {
    val cells = docs
      .select(col(id), explode(split(col(text), "")).as("ch"))
      .where(col("ch") =!= "")
      .groupBy(col(id), col("ch"))
      .agg(count(lit(1)).as("c"))
    val ent = cells.groupBy(col(id))
      .agg(sum(col("c")).as("n_chars"),
        sum(round(col("c") * log(2.0, col("c")), 9)).as("__clogc"))
      .select(col(id), col("n_chars"),
        round(log(2.0, col("n_chars")) - col("__clogc") / col("n_chars"), 6)
          .as("entropy"))
    docs.select(col(id)).join(ent, Seq(id), "left")
      .select(col(id), coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("entropy"), lit(0.0)).as("entropy"))
  }

  /** Code-vs-prose scoring — the mixture-routing signal: source code
    * reads as indented lines plus bracket/operator density, prose as
    * neither, and the router that decides "code pile or text pile"
    * (different tokenizers, different quality rules, different budget
    * lines) needs the score per document. Pure per-row expressions:
    * `indent_frac` = lines starting with a space/tab over all lines,
    * `sym_density` = `[]{}();=<>` characters over all characters (both
    * rounded 4), `is_code` = indent_frac ≥ 0.3 OR sym_density ≥ 0.05
    * (thresholds from the doc fixtures; tune per corpus). An empty
    * document splits to one empty line (the split convention) and
    * scores (1, 0.0, 0.0, false).
    */
  def codeScore(docs: DataFrame, id: String, text: String): DataFrame = {
    val lines = split(col(text), "\n")
    val indented = size(filter(lines,
      l => l.startsWith(" ") || l.startsWith("\t")))
    val nChars = length(col(text))
    val symChars = nChars -
      length(regexp_replace(col(text), "[\\[\\]{}();=<>]", ""))
    docs.select(col(id), size(lines).cast("long").as("n_lines"),
        when(size(lines) > 0,
          round(indented.cast("double") / size(lines), 4))
          .otherwise(lit(0.0)).as("indent_frac"),
        when(nChars > 0,
          round(symChars.cast("double") / nChars, 4))
          .otherwise(lit(0.0)).as("sym_density"))
      .withColumn("is_code",
        col("indent_frac") >= 0.3 || col("sym_density") >= 0.05)
  }

  /** Intra-document duplicate-line removal — the WITHIN-doc line rule
    * next to [[stripBoilerplateLines]]'s cross-doc census: scraped
    * pages repeat nav rows, cookie banners, and table headers inside
    * one document; each line keeps its FIRST occurrence and the doc
    * reassembles in original order. Output per document:
    * `text_deduped` and `n_removed`.
    *
    * Scale shape: one (doc, line) hash aggregate (min position +
    * occurrence count, map-side combined) and a doc-keyed reassembly
    * aggregate (array_sort inside the group — bounded by lines per
    * doc, never a window).
    */
  def dedupLines(docs: DataFrame, id: String, text: String)
      : DataFrame = {
    val kept = docs
      .select(col(id), posexplode(split(col(text), "\n"))
        .as(Seq("pos", "line")))
      .groupBy(col(id), col("line"))
      .agg(min(col("pos")).as("pos"), count(lit(1)).as("c"))
    kept.groupBy(col(id))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("text_deduped"),
        (sum(col("c")) - count(lit(1))).as("n_removed"))
  }

  /** CROSS-document sentence dedup — the CCNet granularity between
    * [[dedupLines]] (intra-document) and [[stripBoilerplateLines]]
    * (census-thresholded): every sentence that already appeared in a
    * LOWER (doc, position) keeps only its first occurrence corpus-wide,
    * so syndication chains, quote farms, and template paragraphs
    * deflate while each sentence survives exactly once. Sentences are
    * `[.!?]+`-terminated segments (the [[readability]] splitter);
    * first occurrence is min (doc id, position) over the md5 sentence
    * key — deterministic under any layout. Output per doc: the
    * rewritten text (kept sentences in original order, '. '-joined),
    * kept/removed counts; docs whose every sentence is seen elsewhere
    * first emit an EMPTY rewrite (the drop signal), not no row.
    *
    * Scale shape: one (sentence-hash)-keyed aggregate picks winners
    * (shuffle carries hashes + (id, pos) pairs, never text twice), a
    * semi-join back tags keepers, and the rewrite is a doc-keyed fold —
    * the dedupLines shape with the census made global.
    */
  def dedupSentences(docs: DataFrame, id: String, text: String)
      : DataFrame = {
    val sent = docs
      .select(col(id), posexplode(split(col(text), "[.!?]+"))
        .as(Seq("pos", "s")))
      .withColumn("s", trim(col("s")))
      .where(col("s") =!= "")
      .withColumn("h", md5(col("s")))
    val winners = sent
      .groupBy(col("h"))
      .agg(min(struct(col(id).as("wid"), col("pos").as("wpos")))
        .as("w"))
      .select(col("h"), col("w.wid").as("wid"), col("w.wpos").as("wpos"))
    val tagged = sent.join(winners, "h")
      .withColumn("keep",
        col(id) === col("wid") && col("pos") === col("wpos"))
    tagged.groupBy(col(id))
      .agg(
        array_join(transform(
          array_sort(collect_list(
            when(col("keep"), struct(col("pos"), col("s"))))),
          x => x.getField("s")), ". ").as("text_deduped"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_removed"))
  }

  /** Per-language tokenizer fertility — the multilingual budget audit:
    * how many (whitespace and subword-proxy) tokens a language costs
    * per character decides the real mixture a token budget buys (a
    * language at 2× fertility gets half the documents for the same
    * tokens). Output per language: `n_docs`, `n_tokens`, `n_subwords`,
    * `n_chars`, `chars_per_token` and `subwords_per_token` (both
    * rounded 4; null when the language has zero tokens — reported,
    * not silently dropped, since an all-empty slice is itself a
    * data-quality signal).
    *
    * Scale shape: one language-keyed hash aggregate over per-row
    * codegen'd counting expressions — map-side combined, |languages|
    * output rows.
    */
  def tokenFertility(docs: DataFrame, lang: String, text: String)
      : DataFrame = {
    docs
      .select(col(lang).as("lang"),
        tokenCount(col(text)).cast("long").as("__tk"),
        subwordCount(col(text)).cast("long").as("__sw"),
        length(col(text)).cast("long").as("__ch"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tk")).as("n_tokens"),
        sum(col("__sw")).as("n_subwords"), sum(col("__ch")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("n_subwords"), col("n_chars"),
        when(col("n_tokens") > 0,
          round(col("n_chars") / col("n_tokens"), 4))
          .as("chars_per_token"),
        when(col("n_tokens") > 0,
          round(col("n_subwords") / col("n_tokens"), 4))
          .as("subwords_per_token"))
  }

  /** Packing-efficiency audit over [[packSequences]] output — the
    * trainer-utilization number: a packing run that leaves sequences
    * half-empty wastes the same fraction of every training step.
    * Per pack group: `n_seqs`, `n_docs`, `n_tokens`, `fill_rate` =
    * Σ min(seq tokens, maxTokens) / (n_seqs·maxTokens) (overhang
    * doesn't inflate fill past 1, rounded 6), `n_overhang` (sequences
    * whose boundary doc spills past the budget — truncation losses),
    * and `n_underfilled` (sequences below budget — padding losses).
    *
    * Scale shape: the [[packSequences]] window + aggregate, then a
    * |groups|-row re-aggregate — nothing beyond the packing's own
    * shuffle.
    */
  def packEfficiency(df: DataFrame, id: String, text: String,
      maxTokens: Int, groups: Int): DataFrame = {
    packSequences(df, id, text, maxTokens, groups)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_seqs"), sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        round(sum(least(col("n_tokens"), lit(maxTokens.toLong))) /
          (count(lit(1)) * maxTokens.toDouble), 6).as("fill_rate"),
        sum(when(col("n_tokens") > maxTokens, 1L).otherwise(0L))
          .as("n_overhang"),
        sum(when(col("n_tokens") < maxTokens, 1L).otherwise(0L))
          .as("n_underfilled"))
  }

  /** License-header detection — the legal gate a code/document corpus
    * runs before training (permissively-licensed subsets are a
    * contractual requirement, and GPL contamination of a "permissive
    * only" corpus is exactly the row this flags): matches the
    * distinctive normative phrases of the four big families
    * case-insensitively, first match wins in MIT → Apache-2.0 → GPL →
    * BSD order (the phrases are mutually exclusive in real headers;
    * the order only breaks pathological multi-license blobs
    * deterministically). Pure `contains` on one lowercase pass — no
    * regex backtracking on corpus text. Unrecognized/absent headers
    * report null + false.
    */
  def licenseDetect(docs: DataFrame, id: String, text: String)
      : DataFrame = {
    val t = lower(col(text))
    val lic = when(t.contains(
        "permission is hereby granted, free of charge"), "MIT")
      .when(t.contains(
        "licensed under the apache license, version 2.0"), "Apache-2.0")
      .when(t.contains("gnu general public license"), "GPL")
      .when(t.contains(
        "redistribution and use in source and binary forms"), "BSD")
    docs.select(col(id), lic.as("license"),
      lic.isNotNull.as("has_license"))
  }

  /** Flesch reading-ease scoring — the readability gate an educational/
    * kids-corpus curation (or its inverse, a complexity floor) filters
    * on: 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    * with sentences as non-empty `[.!?]+` segments and syllables as
    * vowel-group runs (`[aeiouy]+`, min 1 per word) — the standard
    * dictionary-free approximation, stated as such: it's a FILTER
    * SIGNAL, not linguistics. Pure column expressions (split + HOF
    * aggregate + regexp_count, all codegen'd); docs with no words
    * report null instead of dividing by zero.
    *
    * Output: (id, n_words, n_sentences, n_syllables, flesch rounded 4).
    */
  def readability(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = filter(tokens(col(text)), w => w =!= "")
    val sents = greatest(lit(1L),
      size(filter(split(col(text), "[.!?]+"),
        s => length(trim(s)) > 0)).cast("long"))
    val sylls = aggregate(toks, lit(0L),
      (acc, w) => acc +
        greatest(lit(1L), regexp_count(w, lit("[aeiouy]+")).cast("long")))
    docs.select(col(id),
        size(toks).cast("long").as("n_words"),
        sents.as("n_sentences"),
        sylls.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0,
          round(lit(206.835) -
            lit(1.015) * col("n_words") / col("n_sentences") -
            lit(84.6) * col("n_syllables") / col("n_words"), 4)))
  }

  /** Corpus Zipf audit — the term-frequency-distribution fingerprint: a
    * natural-language corpus's top term frequencies follow f ∝ rank^s
    * with s ≈ −1; a corpus of templates, logs, or scraped boilerplate
    * bends the line (shallow slope = flat head, low r² = no power law
    * at all), so the OLS fit of ln f on ln rank over the top `topN`
    * terms is a one-row data-quality signal cheap enough to run per
    * snapshot. Output: (top_n, total_tokens, coverage = head's share
    * of all tokens, slope, intercept, r2).
    *
    * Determinism: ln values quantize to 9 decimals before the folds
    * (the BM25 idf convention); the regression reduces the top-N rows
    * to five sums, so engine summation order drifts below the
    * 4-decimal hand-off. Needs ≥2 distinct terms (the fit's
    * denominator); the degenerate 1-term corpus returns a null slope
    * rather than erroring.
    *
    * Scale shape: one (term, count) hash aggregate over one scan, a
    * TakeOrdered head of `topN`, then all arithmetic on ≤topN rows —
    * the corpus never shuffles anything wider than (term, count).
    */
  def zipfAudit(docs: DataFrame, id: String, text: String,
      topN: Int): DataFrame = {
    require(topN >= 2, s"topN must be >= 2, got $topN")
    val tf = docs.select(explode(tokens(col(text))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val total = tf.agg(sum(col("f")).as("total_tokens"))
    val top = tf.orderBy(col("f").desc, col("w").asc).limit(topN)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("f").desc, col("w").asc)))
      .select(col("f"),
        round(log(col("rk").cast("double")), 9).as("x"),
        round(log(col("f").cast("double")), 9).as("y"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    top.agg(
        count(lit(1)).cast("int").as("top_n"),
        count(lit(1)).cast("double").as("n"),
        sum(col("f")).as("__hf"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .crossJoin(broadcast(total))
      .select(col("top_n"), col("total_tokens"),
        round(col("__hf") / col("total_tokens"), 4).as("coverage"),
        // degenerate spreads (all-equal ranks can't happen past the
        // topN >= 2 gate, but all-equal FREQUENCIES zero the y spread)
        // report null, not an ANSI divide error: "no power law" is a
        // legitimate audit answer for a template corpus
        when(den =!= 0, round(num / den, 4)).as("slope"),
        when(den =!= 0,
          round((col("sy") - num / den * col("sx")) / col("n"), 4))
          .as("intercept"),
        when(den * (col("n") * col("syy") - col("sy") * col("sy")) =!= 0,
          round(num * num /
            (den * (col("n") * col("syy") - col("sy") * col("sy"))), 4))
          .as("r2"))
  }

  /** Per-cluster distinguishing terms — the "cluster card" a corpus
    * team reads to know what each semantic cluster IS: for every
    * cluster, the top-`k` terms by within-cluster count × cross-cluster
    * idf (ln((C+1)/(cdf+1)), C = clusters, cdf = clusters containing
    * the term — terms every cluster shares score ≤ 0; terms unique to
    * one cluster score highest). Deterministic tie-break (score desc,
    * term asc); idf rounds to 9 and the score to 6 so the report
    * reproduces across engines.
    *
    * Scale shape: one (cluster, term) aggregate over the token stream;
    * the cluster-df table is VOCABULARY-sized, so the counts×cdf join
    * keys on the term (a shuffle join — broadcasting a web-scale
    * vocabulary would be wrong; AQE may still pick broadcast when it
    * fits); only the 1-row cluster-count aggregate broadcasts. The
    * final top-k window partitions by cluster.
    */
  def clusterTerms(
      df: DataFrame, cluster: String, text: String, k: Int): DataFrame = {
    val counts = df
      .select(col(cluster).as("cl"),
        explode(split(lower(trim(col(text))), "\\s+")).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("cl"), col("term")).agg(count(lit(1)).as("cnt"))
    val nClusters = counts.agg(countDistinct(col("cl")).as("nc"))
    val cdf = counts.groupBy(col("term")).agg(count(lit(1)).as("cdf"))
    val w = Window.partitionBy(col("cl"))
      .orderBy(col("score").desc, col("term"))
    counts.join(cdf, "term")
      .crossJoin(broadcast(nClusters))
      .withColumn("idf", round(
        log((col("nc").cast("double") + 1) / (col("cdf").cast("double") + 1)),
        9))
      .withColumn("score", round(col("cnt") * col("idf"), 6))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("cl").as(cluster), col("term"), col("cnt"),
        col("score"), col("rk").cast("int").as("rk"))
  }
}
