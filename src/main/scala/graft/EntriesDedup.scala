package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import org.apache.spark.sql.types.StructType

import graft.ann.Ann
import graft.dedup.{Clusters, Dedup, SimHash}
import graft.ingest.{FileListing, Router, ZipSource}
import graft.multimodal.Multimodal
import graft.operators.Salted
import graft.pipeline.SchemaEvolution
import graft.schema.{ColumnSpec, TableSpec}
import graft.streaming.Bookmark
import graft.text.{Dsir, TextAnalysis}
import graft.relationalize.Relationalize
import graft.sources.{JsonDataset, ParquetDataset, TarShards, Warc}
import graft.validate.{ErrorSuppression, FileMetadata, JsonSchemaValidator, SchemaCache, SchemaResolver}


/** LLM-pipeline deduplication tier.
  *
  * Split from the single SparkEntry registry file by tier; entry
  * semantics, names, and oracles are unchanged. [[SparkEntry]] holds
  * the one declaration-ordered registry over all tiers.
  */
private[graft] object EntriesDedup {
  import EntryKit._

  // LLM-pipeline: deduplication
  // --------------------------------------------------------------------

  /** Exact dedup — one fingerprint hash-aggregate pass. */
  val dedupExact = Q(
    (s, dir) => Dedup.exact(t(s, dir, "documents"), "doc_id", "text"),
    Some("SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS n_dups FROM documents GROUP BY 1"))

  /** Template/structural dedup ([[Dedup.templateGroups]]): digit runs
    * mask to '#' and whitespace collapses before hashing, so
    * boilerplate families (product pages, pagination shells, log
    * dumps) group under one fingerprint — the cheap tier between
    * exact dedup and MinHash. Oracle re-derives the masked md5 with
    * global-flag regexp_replace.
    */
  val dedupTemplate = Q(
    (s, dir) => Dedup.templateGroups(t(s, dir, "documents"), "doc_id", "text"),
    Some("SELECT md5(regexp_replace(regexp_replace(lower(trim(text)), '[0-9]+', '#', 'g'), '\\s+', ' ', 'g')) AS fp, min(doc_id) AS keeper, count(*) AS n_members FROM documents GROUP BY 1"))

  /** R4 — de-relationalize ([[graft.relationalize.Relationalize
    * .nest]]): the inverse of the repo's flagship flatten — child rows
    * fold back into an ordered array on the parent (docs with no
    * children get `[]`, not null), and the rebuilt nested document
    * serializes via to_json for a byte-level cross-engine pin. The
    * fixture plants 1-3 ASCII child rows per doc and drops doc_id%11's
    * children to exercise the empty-array contract.
    */
  val r4Derelationalize = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val child = docs
        .where(pmod(col("doc_id"), lit(11)) =!= 0)
        .select(col("doc_id"), explode(sequence(lit(0),
          pmod(col("doc_id"), lit(3)).cast("int"))).as("idx"))
        .select(col("doc_id"), col("idx"),
          concat(lit("t"), col("idx"), lit("_"), col("doc_id")).as("w"))
      graft.relationalize.Relationalize
        .nest(docs, child, "doc_id", "idx", col("w"), "words")
        .select(col("doc_id"),
          to_json(struct(col("doc_id"), col("lang"), col("words")))
            .as("doc_json"))
    },
    Some("WITH c AS (SELECT doc_id, i AS idx, 't' || i || '_' || doc_id AS w FROM documents, unnest(generate_series(0, doc_id % 3)) AS u(i) WHERE doc_id % 11 <> 0), " +
      "f AS (SELECT doc_id, list(w ORDER BY idx) AS words FROM c GROUP BY 1) " +
      "SELECT d.doc_id, to_json(struct_pack(doc_id := d.doc_id, lang := d.lang, words := COALESCE(f.words, []))) AS doc_json FROM documents d LEFT JOIN f USING (doc_id)"))

  /** pass@k evaluation reduction ([[graft.operators.PassAtK]]): five
    * samples per problem with planted correctness, the unbiased
    * 1 − C(n−c,k)/C(n,k) at k = 2 — the HumanEval-style estimator as
    * one problem-keyed aggregate. The oracle reproduces the clamped
    * integer products and the single division term for term.
    */
  val evalPassAtK = Q(
    (s, dir) => graft.operators.PassAtK.passAtK(
      t(s, dir, "documents").select(
        floor(col("doc_id") / 5).cast("long").as("prob"),
        (pmod(col("n_chars") + col("doc_id"), lit(3)) === 0).as("ok")),
      "prob", "ok", k = 2),
    Some("WITH s AS (SELECT doc_id // 5 AS problem, CASE WHEN (n_chars + doc_id) % 3 = 0 THEN 1 ELSE 0 END AS ok FROM documents), " +
      "g AS (SELECT problem, count(*) AS n, CAST(sum(ok) AS BIGINT) AS c FROM s GROUP BY 1) " +
      "SELECT problem, n, c, round(CAST(c AS DOUBLE) / n, 6) AS pass_at_1, " +
      "CASE WHEN n >= 2 THEN round(1 - CAST(GREATEST(n - c, 0) * GREATEST(n - c - 1, 0) AS DOUBLE) / (n * (n - 1)), 6) END AS pass_at_2 FROM g"))

  /** Code-vs-prose scoring ([[graft.text.TextAnalysis.codeScore]]):
    * indent fraction + bracket/operator density + the routing flag,
    * all per-row codegen'd expressions. The oracle re-derives both
    * fractions with list_filter / global regexp_replace.
    */
  val textCodeScore = Q(
    (s, dir) => TextAnalysis.codeScore(t(s, dir, "documents"), "doc_id", "text"),
    Some("WITH b AS (SELECT doc_id, string_split(text, chr(10)) AS ls, length(text) AS nc, length(regexp_replace(text, '[\\[\\]{}();=<>]', '', 'g')) AS keep FROM documents), " +
      "m AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines, " +
      "CASE WHEN len(ls) > 0 THEN round(CAST(len(list_filter(ls, l -> l LIKE ' %' OR l LIKE chr(9) || '%')) AS DOUBLE) / len(ls), 4) ELSE 0.0 END AS indent_frac, " +
      "CASE WHEN nc > 0 THEN round(CAST(nc - keep AS DOUBLE) / nc, 4) ELSE 0.0 END AS sym_density FROM b) " +
      "SELECT doc_id, n_lines, indent_frac, sym_density, indent_frac >= 0.3 OR sym_density >= 0.05 AS is_code FROM m"))

  /** Intra-document duplicate-line removal ([[graft.text.TextAnalysis
    * .dedupLines]]): each line keeps its first occurrence, docs
    * reassemble in order, removals counted — the within-doc C4 line
    * rule beside the cross-doc boilerplate census. Oracle re-derives
    * first-occurrence positions and the ordered string_agg.
    */
  val textDedupLines = Q(
    (s, dir) => TextAnalysis.dedupLines(t(s, dir, "documents"), "doc_id", "text"),
    Some("WITH l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line, generate_subscripts(string_split(text, chr(10)), 1) AS pos FROM documents), " +
      "k AS (SELECT doc_id, line, min(pos) AS pos, count(*) AS c FROM l GROUP BY 1, 2) " +
      "SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_deduped, CAST(sum(c) - count(*) AS BIGINT) AS n_removed FROM k GROUP BY 1"))

  /** Per-document character entropy ([[graft.text.TextAnalysis
    * .charEntropy]]): the Gopher-style bits-per-char quality signal —
    * base64/key-mash spam reads high, padding floods read near zero.
    * Per-char terms quantize to 9 before the fold on both sides; the
    * oracle re-derives the char histogram via substr explode.
    */
  val textEntropy = Q(
    (s, dir) => TextAnalysis.charEntropy(t(s, dir, "documents"), "doc_id", "text"),
    Some("WITH ch AS (SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch FROM documents, unnest(range(1, length(text) + 1)) AS u(i)), " +
      "cells AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2), " +
      "e AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars, sum(round(c * log2(c), 9)) AS clogc FROM cells GROUP BY 1) " +
      "SELECT d.doc_id, COALESCE(e.n_chars, 0) AS n_chars, COALESCE(round(log2(e.n_chars) - clogc / e.n_chars, 6), 0.0) AS entropy FROM documents d LEFT JOIN e ON e.doc_id = d.doc_id"))

  /** Exact word-set Jaccard near-dup pairs, adaptive: this corpus's
    * ~31-token vocabulary fits in a 64-bit mask, so the probe picks
    * [[Dedup.jaccardPairsBitset]] — per-doc bitmasks, popcount Jaccard
    * over DISTINCT masks, expansion joins sized by the output — instead
    * of the inverted-index token self-join (Σ df² ≈ 620M joined rows at
    * sf0.1 on this corpus). General vocabularies fall back to
    * [[Dedup.jaccardPairs]] (salted form for Zipf skew in DedupSpec).
    */
  val dedupJaccard = Q(
    (s, dir) => Dedup.jaccardPairsAuto(
      t(s, dir, "documents"), "doc_id", "text", threshold = 0.8),
    Some("WITH w AS (SELECT DISTINCT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word FROM documents), sz AS (SELECT doc_id, count(*) AS n FROM w GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, c * 1.0 / (sa.n + sb.n - c) AS jaccard FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8"))

  /** Asymmetric containment pairs ([[Dedup.containmentPairs]]):
    * |∩| / min(|A|, |B|) ≥ 0.9 over word sets — catches the
    * quote-inclusion shape Jaccard scores near zero. No symmetric size
    * filter exists for this relation (that asymmetry is the point), so
    * the plan's scale valve is the df cap; the entry runs uncapped to
    * stay bit-comparable with the oracle's full inverted index.
    */
  val dedupContainment = Q(
    // The df cap is THE scale valve for containment (no symmetric size
    // filter exists for an asymmetric relation — module doc), so the
    // entry runs the capped path: postings above df 300 drop before the
    // pair join, sizes counted post-cap, cap mirrored in the oracle's
    // postings CTE. Uncapped brute-force parity lives in DedupSpec.
    (s, dir) => Dedup.containmentPairs(
      t(s, dir, "documents"), "doc_id", "text", threshold = 0.9,
      maxDf = Some(300L)),
    Some("WITH w0 AS (SELECT DISTINCT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word FROM documents), df AS (SELECT word, count(*) AS dfc FROM w0 GROUP BY 1), w AS (SELECT w0.doc_id, w0.word FROM w0 JOIN df USING (word) WHERE dfc <= 300), sz AS (SELECT doc_id, count(*) AS n FROM w GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, c * 1.0 / least(sa.n, sb.n) AS containment FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / least(sa.n, sb.n) >= 0.9"))

  /** Character-trigram Jaccard near-dup pairs — the boundary-free
    * tokenizer (CJK, OCR noise, code) over the same counted inverted
    * index as `dedup_jaccard`. The entry caps the corpus at 500 docs:
    * ubiquitous trigrams ("e t", "he ") appear in every doc, so Σ df²
    * grows quadratically with corpus size — the production valve is
    * `maxDf` (drop grams above a document-frequency cap; exercised in
    * DedupSpec), which this oracle-checked entry leaves off to stay
    * bit-comparable.
    */
  val dedupNgramJaccard = Q(
    (s, dir) => Dedup.ngramJaccardPairs(
      t(s, dir, "documents").where(col("doc_id") < 500), "doc_id", "text",
      n = 3, threshold = 0.8),
    Some("WITH g0 AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(text) >= 3 THEN [substr(lower(text), i, 3) FOR i IN generate_series(1, len(text)-2)] ELSE [lower(text)] END)) AS w FROM documents WHERE doc_id < 500), sz AS (SELECT doc_id, count(*) AS n FROM g0 GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM g0 a JOIN g0 b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, c * 1.0 / (sa.n + sb.n - c) AS jaccard FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8"))

  /** The `maxDf`-capped twin of `dedup_ngram_jaccard` — the code path
    * that must ALWAYS be on at 100 TB (ubiquitous trigrams dominate the
    * Σ df² fanout while discriminating nothing). Grams above the df cap
    * are dropped from the vocabulary first, so sets, sizes, and Jaccard
    * all see the capped vocabulary; the oracle mirrors the cap with a
    * df CTE (`WHERE dfc <= 100`) over the same gram postings. 17 pairs
    * vs the uncapped 25 — the cap is visibly load-bearing in the result,
    * not a no-op.
    */
  val dedupNgramJaccardCapped = Q(
    (s, dir) => Dedup.ngramJaccardPairs(
      t(s, dir, "documents").where(col("doc_id") < 500), "doc_id", "text",
      n = 3, threshold = 0.8, maxDf = Some(100L)),
    Some("WITH g0 AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(text) >= 3 THEN [substr(lower(text), i, 3) FOR i IN generate_series(1, len(text)-2)] ELSE [lower(text)] END)) AS w FROM documents WHERE doc_id < 500), df AS (SELECT w, count(*) AS dfc FROM g0 GROUP BY 1), g AS (SELECT g0.doc_id, g0.w FROM g0 JOIN df USING (w) WHERE dfc <= 100), sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM g a JOIN g b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, c * 1.0 / (sa.n + sb.n - c) AS jaccard FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8"))

  /** The PREFIX-FILTERED twin of `dedup_ngram_jaccard_capped`
    * ([[Dedup.ngramJaccardPairsPrefix]]) — identical capped relation,
    * identical oracle, but candidates collide only on each doc's
    * rarest grams (All-Pairs/PPJoin prefix scheme), the scale path
    * when the df cap is corpus-relative and Σ df² would be Θ(corpus²).
    */
  val dedupNgramPrefixCapped = Q(
    (s, dir) => Dedup.ngramJaccardPairsPrefix(
      t(s, dir, "documents").where(col("doc_id") < 500), "doc_id", "text",
      n = 3, threshold = 0.8, maxDf = Some(100L)),
    Some("WITH g0 AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(text) >= 3 THEN [substr(lower(text), i, 3) FOR i IN generate_series(1, len(text)-2)] ELSE [lower(text)] END)) AS w FROM documents WHERE doc_id < 500), df AS (SELECT w, count(*) AS dfc FROM g0 GROUP BY 1), g AS (SELECT g0.doc_id, g0.w FROM g0 JOIN df USING (w) WHERE dfc <= 100), sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM g a JOIN g b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, c * 1.0 / (sa.n + sb.n - c) AS jaccard FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8"))

  /** The posting-DECOMPOSED twin of `dedup_ngram_jaccard_capped` on a
    * duplicate-saturated fixture — proves the adaptive g×g per-gram
    * decomposition ([[Dedup.saltedPostingLegs]], the relative-df-cap
    * scale valve) INSIDE the oracle gate: 8 base docs replicated 24×
    * byte-identical (id = doc_id·1000 + k) give every gram a posting
    * list of ≥24 ids, and `maxPostings = 8` forces g ≥ 3 → ≥9 bounded
    * join cells per gram. The df cap (96 = 24·4, i.e. grams shared by
    * >4 base docs drop) runs UNDER the decomposition, so cap + split
    * compose. The oracle is the exact capped trigram Jaccard over the
    * replicated fixture — a pair met twice or lost by the chunk
    * algebra shifts |∩| and flips the hash.
    */
  val dedupNgramDecomposed = Q(
    (s, dir) => {
      val sat = t(s, dir, "documents").where(col("doc_id") < 8)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(23))).as("k"))
        .select((col("doc_id") * 1000 + col("k")).cast("long").as("doc_id"),
          col("text"))
      Dedup.ngramJaccardPairs(sat, "doc_id", "text", n = 3,
        threshold = 0.8, maxDf = Some(96L), maxPostings = Some(8))
    },
    Some("WITH sat AS (SELECT d.doc_id * 1000 + g.k AS doc_id, d.text AS text FROM documents d CROSS JOIN generate_series(0, 23) AS g(k) WHERE d.doc_id < 8), " +
      "g0 AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(text) >= 3 THEN [substr(lower(text), i, 3) FOR i IN generate_series(1, len(text)-2)] ELSE [lower(text)] END)) AS w FROM sat), " +
      "df AS (SELECT w, count(*) AS dfc FROM g0 GROUP BY 1), " +
      "g AS (SELECT g0.doc_id, g0.w FROM g0 JOIN df USING (w) WHERE dfc <= 96), " +
      "sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1), " +
      "inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM g a JOIN g b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
      "SELECT id1, id2, c * 1.0 / (sa.n + sb.n - c) AS jaccard FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8"))

  /** Cross-source overlap matrix ([[Dedup.sourceOverlapMatrix]]): per
    * source pair, distinct word-3-gram intersection, Jaccard, and
    * containment — the "does snapshot B re-crawl snapshot A" curation
    * report. The maxSources = 10 cap is LOAD-BEARING at 20 sources
    * (ubiquitous grams drop from every vocabulary before sizes and
    * intersections), and the oracle applies the identical cap, so the
    * valve's effect on every reported number is hash-pinned.
    */
  val corpusOverlapMatrix = Q(
    (s, dir) => Dedup.sourceOverlapMatrix(
      t(s, dir, "documents"), "source", "text",
      shingleN = 3, maxSources = Some(10)),
    Some("WITH g0 AS (SELECT DISTINCT source AS src, unnest(CASE WHEN len(ws) >= 3 THEN list_distinct([array_to_string(ws[i:i+2], ' ') FOR i IN generate_series(1, len(ws)-2)]) ELSE [array_to_string(ws, ' ')] END) AS g FROM (SELECT source, string_split_regex(lower(text), '\\s+') AS ws FROM documents)), " +
      "hot AS (SELECT g FROM g0 GROUP BY g HAVING count(*) > 10), " +
      "gk AS (SELECT * FROM g0 WHERE g NOT IN (SELECT g FROM hot)), " +
      "sz AS (SELECT src, CAST(count(*) AS BIGINT) AS n FROM gk GROUP BY 1), " +
      "inter AS (SELECT a.src AS src_a, b.src AS src_b, CAST(count(*) AS BIGINT) AS n_common FROM gk a JOIN gk b ON a.g = b.g AND a.src < b.src GROUP BY 1, 2) " +
      "SELECT src_a, src_b, n_common, sa.n AS n_a, sb.n AS n_b, round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard, round(n_common * 1.0 / least(sa.n, sb.n), 6) AS containment FROM inter JOIN sz sa ON sa.src = src_a JOIN sz sb ON sb.src = src_b"))

  /** MinHash-LSH parameter planner ([[graft.dedup.LshPlan.plan]]): for
    * a 128-hash signature budget at threshold 0.5, every divisor
    * (bands, rows) split scored by its S-curve's wasted-collision and
    * lost-recall areas — the design report that picks
    * [[Dedup.minhashPairs]]'s banding before a corpus-scale run. Pure
    * bounded arithmetic (8 splits × 19 grid cells); the oracle replays
    * the same curve in SQL. Threshold 0.5 sits ON the grid (j/20 < 0.5
    * ⇔ j < 10 exactly), so the area split is engine-exact.
    */
  val dedupLshPlan = Q(
    (s, dir) => graft.dedup.LshPlan.plan(
      s, totalHashes = 128, threshold = 0.5),
    Some("WITH div AS (SELECT CAST(b AS INT) AS bands, CAST(128 // b AS INT) AS rows FROM generate_series(1, 128) AS g(b) WHERE 128 % b = 0), " +
      "cell AS (SELECT bands, rows, i / 20.0 AS jac FROM div CROSS JOIN generate_series(1, 19) AS s(i)), " +
      "p AS (SELECT bands, rows, jac, 1.0 - pow(1.0 - pow(jac, rows), bands) AS p FROM cell), " +
      "sc AS (SELECT bands, rows, round(pow(1.0 / bands, 1.0 / rows), 4) AS t_star, " +
      "round(sum(CASE WHEN jac < 0.5 THEN p ELSE 0 END) / 20, 4) AS fp_area, " +
      "round(sum(CASE WHEN jac >= 0.5 THEN 1.0 - p ELSE 0 END) / 20, 4) AS fn_area FROM p GROUP BY 1, 2), " +
      "c AS (SELECT *, round(fp_area + fn_area, 4) AS cost FROM sc), " +
      "m AS (SELECT min(cost) AS mc FROM c) " +
      "SELECT bands, rows, t_star, fp_area, fn_area, cost, cost = mc AS best FROM c, m"))

  /** MinHash-LSH near-dup detection (the 100 TB path): banded signatures →
    * in-bucket candidates → exact verification. The oracle is the exact
    * all-pairs shingle Jaccard — the entry proves the LSH pipeline loses
    * nothing at this threshold.
    */
  val dedupMinhash = Q(
    (s, dir) => Dedup.minhashPairs(
      t(s, dir, "documents"), "doc_id", "text", threshold = 0.8),
    Some("WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word, generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS ord FROM documents), sh0 AS (SELECT doc_id, word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY ord) || ' ' || lead(word, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS sh FROM t), sh AS (SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, c * 1.0 / (sa.n + sb.n - c) AS jaccard FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8"))

  /** Planner-driven MinHash ([[graft.dedup.LshPlan.plan]] feeding
    * [[Dedup.minhashPairs]]): the banding comes from the min-cost split
    * the planner reports instead of a hand-picked constant — the
    * composite a real pipeline runs (plan once, mine with the planned
    * parameters). The BANDING threshold is deliberately planned BELOW
    * the verification threshold (0.5 vs 0.8): banding misses are
    * unrecoverable recall, banding extras are just verification CPU,
    * so the catch curve belongs left of the keep line — at t = 0.8 the
    * min-cost split (8,16) would deterministically drop ~20% of J=0.9
    * pairs; planned at 0.5 it lands on (32,4), whose collision
    * probability at the fixture's minimum true J = 0.9 is 1 − 1e-15.
    * The plan is a driver-held 8-row model (the k×dim k-means
    * discipline); ties pick the smallest band count. Oracle: exact
    * all-pairs Jaccard, same as `dedup_minhash`.
    */
  val dedupMinhashPlanned = Q(
    (s, dir) => {
      val best = graft.dedup.LshPlan.plan(s, totalHashes = 128,
          threshold = 0.5)
        .where(col("best")).orderBy(col("bands").asc).head()
      Dedup.minhashPairs(
        t(s, dir, "documents"), "doc_id", "text", threshold = 0.8,
        numHashes = 128, bands = best.getAs[Int]("bands"))
    },
    Some("WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word, generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS ord FROM documents), sh0 AS (SELECT doc_id, word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY ord) || ' ' || lead(word, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS sh FROM t), sh AS (SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, c * 1.0 / (sa.n + sb.n - c) AS jaccard FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8"))

  /** The duplicate-saturated MinHash path — proves the g×g hot-bucket
    * decomposition ([[Dedup.saltedBandLegs]]) INSIDE the oracle gate,
    * not just in the ScaleStress census: 8 base docs are replicated 64×
    * byte-identical (id = doc_id·1000 + k), so every (band, bh) bucket
    * holds ≥64 members and `maxBucketSize = 8` forces g ≥ 8 → ≥64
    * bounded join cells per bucket (engagement pinned by
    * DedupSaturatedSpec, which also checks exact candidate parity with
    * the undecomposed join). The oracle is the exact all-pairs shingle
    * Jaccard over the same replicated fixture — a pair lost or
    * duplicated by the chunk algebra flips the hash.
    */
  val dedupMinhashSaturated = Q(
    (s, dir) => {
      val sat = t(s, dir, "documents").where(col("doc_id") < 8)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(63))).as("k"))
        .select((col("doc_id") * 1000 + col("k")).cast("long").as("doc_id"),
          col("text"))
      Dedup.minhashPairs(sat, "doc_id", "text", threshold = 0.8,
        maxBucketSize = 8)
    },
    Some("WITH sat AS (SELECT d.doc_id * 1000 + g.k AS doc_id, d.text AS text FROM documents d CROSS JOIN generate_series(0, 63) AS g(k) WHERE d.doc_id < 8), t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word, generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS ord FROM sat), sh0 AS (SELECT doc_id, word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY ord) || ' ' || lead(word, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS sh FROM t), sh AS (SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, c * 1.0 / (sa.n + sb.n - c) AS jaccard FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8"))

  /** Incremental near-dup against a PERSISTED LSH index
    * ([[Dedup.saveLshIndex]]/[[Dedup.incrementalMinhashPairs]]): the
    * corpus (doc_id % 10 ≠ 0) is banded once and written as a parquet
    * index; the "daily batch" (doc_id % 10 = 0) bands only itself and
    * joins the stored bands — delta cost O(batch), the ingest shape at
    * 100 TB where re-banding the corpus per batch is a non-starter.
    * Oracle: exact all-pairs shingle Jaccard restricted to pairs
    * involving a batch doc (LSH misses at J ≥ 0.8 are ~5·10⁻⁸/pair).
    */
  val dedupIncremental = Q(
    (s, dir) => {
      val corpus = t(s, dir, "documents").where(col("doc_id") % 10 =!= 0)
      val batch = t(s, dir, "documents").where(col("doc_id") % 10 === 0)
      val path = lshIndexCache.getOrElseUpdate(dir, {
        val p = scratchPath("graft_lshidx").toString
        Dedup.saveLshIndex(corpus, "doc_id", "text", p)
        p
      })
      Dedup.incrementalMinhashPairs(
        s, path, batch, "doc_id", "text", threshold = 0.8)
    },
    Some("WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word, generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS ord FROM documents), sh0 AS (SELECT doc_id, word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY ord) || ' ' || lead(word, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS sh FROM t), sh AS (SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, c * 1.0 / (sa.n + sb.n - c) AS jaccard FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8 AND (id1 % 10 = 0 OR id2 % 10 = 0)"))

  val lshIndexCache =
    scala.collection.concurrent.TrieMap[String, String]()

  /** Compute-once composite stages. The E2E curation composites share
    * expensive intermediates (MinHash pair generation, PNG-decode dHash
    * fingerprints, connected components) that each entry previously
    * recomputed — ~6 s of the r8 bench. The first entry to need a stage
    * builds it (attributed via PhaseTimer as `stage_build:<name>`) and
    * spills it to a temp parquet; later entries read the spill. Parquet
    * rather than localCheckpoint so Bench's quiesce()/unpersist sweep
    * between isolated passes can't invalidate it. Entries stay
    * SELF-CONTAINED: any entry alone (Verify subset, isolated bench)
    * builds exactly what it misses. The canonical stage entries
    * (`dedup_minhash`, `mm_image_dhash`, `dedup_clusters`' component
    * iteration) bypass the cache, so the bench always times each raw
    * stage somewhere. Keys carry the sf dir — mixed-dir sessions never
    * cross-read.
    */
  val stageCache =
    scala.collection.concurrent.TrieMap[String, String]()
  def sharedStage(s: SparkSession, stage: String, dir: String)(
      build: => DataFrame): DataFrame = {
    val path = stageCache.getOrElseUpdate(s"$stage|$dir", {
      val p = scratchPath("graft_stage")
        .resolve(stage).toString
      PhaseTimer.phase(s"stage_build:$stage") {
        build.write.mode("overwrite").parquet(p)
      }
      p
    })
    s.read.parquet(path)
  }

  /** Decontamination scan ([[Dedup.contamination]]): near-dup pairs
    * BETWEEN a training corpus (doc_id ≥ 250) and a held-out set
    * (doc_id < 250) — the benchmark-leakage check every training
    * pipeline runs before a data release. Same MinHash-LSH banding as
    * `dedup_minhash`; only cross-set pairs survive. Oracle: exact
    * all-pairs shingle Jaccard restricted to cross pairs.
    */
  val dedupContamination = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contamination(
        docs.where(col("doc_id") >= 250), docs.where(col("doc_id") < 250),
        "doc_id", "text", threshold = 0.8)
    },
    Some("WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word, generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS ord FROM documents), sh0 AS (SELECT doc_id, word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY ord) || ' ' || lead(word, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS sh FROM t), sh AS (SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < 250 AND b.doc_id >= 250 GROUP BY 1, 2) SELECT id2 AS corpus_id, id1 AS held_id, c * 1.0 / (sa.n + sb.n - c) AS jaccard FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8"))

  /** Dedup-cluster resolution: minhash near-dup pairs → connected
    * components → one canonical doc per cluster. Pairwise matches alone
    * over-delete (A~B, B~C must keep one of three); the component step is
    * what production corpus-dedup actually ships. Oracle: recursive-CTE
    * min-label closure over the exact all-pairs Jaccard edges.
    */
  val dedupClusters = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents")
      // shared pair stage; the component ITERATION builds fresh — this
      // entry is the canonical connected-components timing
      val pairs = sharedStage(s, "minhash_pairs", dir)(
        Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8))
      Clusters.connectedComponents(pairs, "id1", "id2",
          nodes = Some(docs.select(col("doc_id"))), idCol = "doc_id")
        .select(col("id").as("doc_id"), col("component").as("cluster"),
          (col("id") === col("component")).as("is_canonical"))
    },
    Some("WITH RECURSIVE t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word, generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS ord FROM documents), sh0 AS (SELECT doc_id, word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY ord) || ' ' || lead(word, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS sh FROM t), sh AS (SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), pairs AS (SELECT id1, id2 FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8), e AS (SELECT id1 AS s, id2 AS d FROM pairs UNION SELECT id2 AS s, id1 AS d FROM pairs), walk(id, lbl) AS (SELECT doc_id, doc_id FROM documents UNION SELECT e.d, w.lbl FROM walk w JOIN e ON e.s = w.id) SELECT id AS doc_id, min(lbl) AS cluster, min(lbl) = id AS is_canonical FROM walk GROUP BY id"))

  /** Leakage-safe split ([[graft.dedup.Clusters.leakageSafeSplit]]):
    * the so6 hash-split applied to the NEAR-DUP COMPONENT instead of
    * the document id, so a doc and its near-duplicates always land on
    * the same side — an id-level split of a dup-bearing corpus puts
    * one copy in train and its twin in test, and the eval silently
    * measures memorization. Same MinHash pair stage as dedup_clusters;
    * the oracle re-derives the recursive min-label closure and the
    * md5-first-hex-char split of the component id.
    */
  val so14LeakageSafeSplit = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = sharedStage(s, "minhash_pairs", dir)(
        Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8))
      graft.dedup.Clusters.leakageSafeSplit(docs, "doc_id", pairs)
        .select(col("id").as("doc_id"), col("component"), col("split"))
    },
    Some("WITH RECURSIVE t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word, generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS ord FROM documents), sh0 AS (SELECT doc_id, word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY ord) || ' ' || lead(word, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS sh FROM t), sh AS (SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), pairs AS (SELECT id1, id2 FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8), e AS (SELECT id1 AS s, id2 AS d FROM pairs UNION SELECT id2 AS s, id1 AS d FROM pairs), walk(id, lbl) AS (SELECT doc_id, doc_id FROM documents UNION SELECT e.d, w.lbl FROM walk w JOIN e ON e.s = w.id), lab AS (SELECT id AS doc_id, min(lbl) AS component FROM walk GROUP BY id) " +
      "SELECT doc_id, component, CASE WHEN substr(md5(CAST(component AS VARCHAR)), 1, 1) <= 'b' THEN 'train' WHEN substr(md5(CAST(component AS VARCHAR)), 1, 1) <= 'd' THEN 'val' ELSE 'test' END AS split FROM lab"))

  /** Leakage-safe K-fold assignment ([[graft.dedup.Clusters
    * .leakageSafeFolds]]): `so14_leakage_safe_split`'s
    * cross-validation twin — every near-dup cluster lands wholly in
    * one of 5 folds via the cluster id's md5 folded mod k, so no
    * fold's held-out set shares a near-dup with any training fold.
    * Same shared minhash pair stage; oracle replays the closure and
    * the '0x' hex fold arithmetic.
    */
  val so15LeakageFolds = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = sharedStage(s, "minhash_pairs", dir)(
        Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8))
      graft.dedup.Clusters.leakageSafeFolds(docs, "doc_id", k = 5, pairs)
        .select(col("id").as("doc_id"), col("component"), col("fold"))
    },
    Some("WITH RECURSIVE t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word, generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS ord FROM documents), sh0 AS (SELECT doc_id, word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY ord) || ' ' || lead(word, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS sh FROM t), sh AS (SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), pairs AS (SELECT id1, id2 FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8), e AS (SELECT id1 AS s, id2 AS d FROM pairs UNION SELECT id2 AS s, id1 AS d FROM pairs), walk(id, lbl) AS (SELECT doc_id, doc_id FROM documents UNION SELECT e.d, w.lbl FROM walk w JOIN e ON e.s = w.id), lab AS (SELECT id AS doc_id, min(lbl) AS component FROM walk GROUP BY id) " +
      "SELECT doc_id, component, CAST(CAST('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8) AS BIGINT) % 5 AS INT) AS fold FROM lab"))

  /** Avro object-container round-trip ([[graft.sources
    * .AvroContainers]]): the documents projection written as 4
    * null-codec Avro containers (hash-routed + sorted by key — layout
    * a pure function of data) and read back through the binaryFile
    * walk with driver-side schema discovery from one header. The
    * distribution ships Avro core but not spark-avro; the
    * ZipSource/TarShards discipline says a missing connector is a
    * reason to write one. Identity oracle.
    */
  val s19AvroRoundtrip = Q(
    (s, dir) => {
      val tmp = scratchPath("graft_s19").toString
      graft.sources.AvroContainers.write(
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"), col("text")),
        tmp, "doc_id", numFiles = 4)
      graft.sources.AvroContainers.read(s, tmp)
    },
    Some("SELECT doc_id, lang, n_chars, text FROM documents"))

  /** Near-dup curation E2E composite — the pipeline a real corpus
    * curator actually runs, executed as ONE entry: MinHash-LSH candidate
    * pairs → connected components → keep one canonical doc (min id) per
    * component → rejoin the corpus for the curated projection. Each
    * stage is individually oracle-checked (`dedup_minhash`,
    * `dedup_clusters`); this entry pins their COMPOSITION, the way
    * `ann_trained_ivf` pins kmeans+ivf. Oracle: exact all-pairs Jaccard
    * edges + recursive-CTE min-label closure, keep-set = component
    * representatives, rejoined to documents.
    */
  val corpusNeardupCuration = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val comps = sharedStage(s, "minhash_comps", dir) {
        val pairs = sharedStage(s, "minhash_pairs", dir)(
          Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8))
        Clusters.connectedComponents(pairs, "id1", "id2",
          nodes = Some(docs.select(col("doc_id"))), idCol = "doc_id")
      }
      val kept = comps.groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"))
        .select(col("component").as("doc_id"), col("n_members"))
      kept.join(docs.select(col("doc_id"), col("lang"), col("n_chars")),
        Seq("doc_id"))
    },
    Some("WITH RECURSIVE t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word, generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS ord FROM documents), sh0 AS (SELECT doc_id, word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY ord) || ' ' || lead(word, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS sh FROM t), sh AS (SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), pairs AS (SELECT id1, id2 FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8), e AS (SELECT id1 AS s, id2 AS d FROM pairs UNION SELECT id2 AS s, id1 AS d FROM pairs), walk(id, lbl) AS (SELECT doc_id, doc_id FROM documents UNION SELECT e.d, w.lbl FROM walk w JOIN e ON e.s = w.id), comp AS (SELECT id, min(lbl) AS cluster FROM walk GROUP BY id), keep AS (SELECT cluster AS doc_id, count(*) AS n_members FROM comp GROUP BY 1) SELECT k.doc_id, k.n_members, d.lang, d.n_chars FROM keep k JOIN documents d ON d.doc_id = k.doc_id"))

  /** Near-dup cluster-size census — the histogram every dedup report
    * publishes (how many singletons, how many pairs, how big is the
    * largest mirror cluster): component sizes from the shared
    * MinHash→connected-components stage, reduced to (cluster_size,
    * n_clusters, n_docs). Two tiny keyed aggregates AFTER the corpus
    * has already collapsed to component labels — report cost is
    * component-bounded, never corpus-bounded.
    */
  val dedupClusterSizeHist = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val comps = sharedStage(s, "minhash_comps", dir) {
        val pairs = sharedStage(s, "minhash_pairs", dir)(
          Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8))
        Clusters.connectedComponents(pairs, "id1", "id2",
          nodes = Some(docs.select(col("doc_id"))), idCol = "doc_id")
      }
      comps.groupBy(col("component"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("sz")).as("n_docs"))
    },
    Some("WITH RECURSIVE t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word, generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS ord FROM documents), sh0 AS (SELECT doc_id, word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY ord) || ' ' || lead(word, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS sh FROM t), sh AS (SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), pairs AS (SELECT id1, id2 FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8), e AS (SELECT id1 AS s, id2 AS d FROM pairs UNION SELECT id2 AS s, id1 AS d FROM pairs), walk(id, lbl) AS (SELECT doc_id, doc_id FROM documents UNION SELECT e.d, w.lbl FROM walk w JOIN e ON e.s = w.id), comp AS (SELECT id, min(lbl) AS cluster FROM walk GROUP BY id), cs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY 1) " +
      "SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters, CAST(sum(cluster_size) AS BIGINT) AS n_docs FROM cs GROUP BY 1"))

  /** Deterministic uniform negative sampling
    * ([[graft.operators.Mixture.uniformNegatives]]): k hash-drawn other
    * ids per anchor on the dense id ring — contrastive-pair prep with
    * no RNG state. Oracle replays the hash draw and the self-collision
    * drop.
    */
  val so13NegativeSample = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Mixture.uniformNegatives(
        docs.select(col("doc_id")), "doc_id", k = 4, n = docs.count())
    },
    Some("WITH nn AS (SELECT count(*) AS n FROM documents), d AS (SELECT doc_id, i AS draw FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)), s AS (SELECT doc_id, draw, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(draw AS VARCHAR)), 1, 12) AS BIGINT) % nn.n AS neg_id FROM d CROSS JOIN nn) SELECT doc_id, CAST(draw AS INT) AS draw, neg_id FROM s WHERE neg_id <> doc_id"))

  /** Z-order clustering codes ([[graft.sources.ZOrder.morton2]]): the
    * bit-interleave behind the 2-D-pruning parquet layout
    * (ZOrderSpec proves the file-skipping effect; this entry proves the
    * code arithmetic bit-for-bit against the oracle's shift/mask
    * re-derivation).
    */
  val so12Zorder = Q(
    (s, dir) => t(s, dir, "events")
      .select(col("event_id"),
        pmod(col("user_id"), lit(1024L)).cast("long").as("x"),
        pmod(col("event_id"), lit(1024L)).cast("long").as("y"))
      .withColumn("zval",
        graft.sources.ZOrder.morton2(col("x"), col("y"))),
    Some("SELECT event_id, x, y, " +
      (0 until 16).map(b =>
        s"((((x >> $b) & 1) << ${2 * b}) | (((y >> $b) & 1) << ${2 * b + 1}))")
        .mkString("(", " | ", ")") +
      " AS zval FROM (SELECT event_id, user_id % 1024 AS x, event_id % 1024 AS y FROM events)"))

  /** Image-corpus curation composite — the multimodal twin of
    * `corpus_neardup_curation`, run END-TO-END as one entry: real PNG
    * decode → dHash → banded Hamming pairs → connected components →
    * one canonical image per near-dup cluster with its member count.
    * The oracle recomputes the hashes from generator arithmetic, the
    * pair set by brute force, and the closure by recursive CTE — every
    * stage of the streaming-free pipeline a multimodal curator runs.
    */
  val corpusImageCuration = Q(
    (s, dir) => {
      // the PNG decode + dHash stage is shared with mm_image_neardup;
      // every blob decodes, so the fingerprint ids ARE the node set
      val fp = sharedStage(s, "dhash_neardup_fp", dir)(
        Multimodal.dhashImage(EntriesMultimodal.mmNearDupPngBlobs(s, dir), "doc_id", "content"))
      val pairs = SimHash.nearPairsFromFingerprints(fp, maxDist = 7, bits = 64)
      val comps = Clusters.connectedComponents(
        pairs.select(col("id1"), col("id2")), "id1", "id2",
        nodes = Some(fp.select(col("id").as("doc_id"))), idCol = "doc_id")
      comps.groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"))
        .select(col("component").as("doc_id"), col("n_members"))
    },
    Some("WITH RECURSIVE d AS (SELECT doc_id, doc_id % 64 AS g, CAST(16 + (doc_id % 64) % 9 AS INT) AS w, CAST(12 + (doc_id % 64) % 7 AS INT) AS h, (doc_id // 64) % 101 AS sel FROM documents), b0 AS (SELECT doc_id, g, sel, i, (i % 8) * w // 9 AS xl, ((i % 8) + 1) * w // 9 AS xr, (i // 8) * h // 8 AS sy FROM d CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) s), b AS (SELECT doc_id, i, CASE WHEN ((xl + g) * (sy + 2 * g + 3) * 7 + xl * 11 + CASE WHEN (xl * 31 + sy * 17) % 101 = sel THEN 128 ELSE 0 END) % 256 > ((xr + g) * (sy + 2 * g + 3) * 7 + xr * 11 + CASE WHEN (xr * 31 + sy * 17) % 101 = sel THEN 128 ELSE 0 END) % 256 THEN '1' ELSE '0' END AS bit FROM b0), fp AS (SELECT doc_id, string_agg(bit, '' ORDER BY i) AS f FROM b GROUP BY doc_id), pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, a.f AS f1, b.f AS f2 FROM fp a JOIN fp b ON a.doc_id < b.doc_id), dd AS (SELECT id1, id2, count(*) FILTER (WHERE substr(f1, CAST(i AS INT), 1) <> substr(f2, CAST(i AS INT), 1)) AS dist FROM pr CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) s GROUP BY 1, 2), pairs AS (SELECT id1, id2 FROM dd WHERE dist <= 7), e AS (SELECT id1 AS s, id2 AS dst FROM pairs UNION SELECT id2 AS s, id1 AS dst FROM pairs), walk(id, lbl) AS (SELECT doc_id, doc_id FROM documents UNION SELECT e.dst, w.lbl FROM walk w JOIN e ON e.s = w.id), comp AS (SELECT id, min(lbl) AS cluster FROM walk GROUP BY id) SELECT cluster AS doc_id, CAST(count(*) AS BIGINT) AS n_members FROM comp GROUP BY 1"))

  /** PMI collocation mining: pointwise mutual information
    * `ln(N·c(w1,w2) / (c(w1)·c(w2)))` over adjacent token pairs, top-k
    * strongest collocations with a minimum pair count (PMI is noise
    * without it — hapax pairs score arbitrarily high). The phrase-mining
    * classic (Church & Hanks 1990). Two vocabulary-sized aggregates off
    * one materialized bigram stream, TakeOrdered top-k, ln quantized 9
    * (BM25 convention).
    */
  val textPmiBigrams = Q(
    (s, dir) => {
      val bg = t(s, dir, "documents")
        .select(TextAnalysis.tokens(col("text")).as("__ws"))
        .select(explode(expr(
          "transform(sequence(0, size(__ws) - 2), " +
            "i -> struct(__ws[i] AS w1, __ws[i + 1] AS w2))")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .localCheckpoint()
      val n = bg.count()
      val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
        .where(col("cb") >= 5)
      val cw1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val cw2 = bg.groupBy(col("w2")).agg(count(lit(1)).as("c2"))
      cb.join(cw1, Seq("w1")).join(cw2, Seq("w2"))
        .select(col("w1"), col("w2"), col("cb"),
          round(log(lit(n.toDouble) * col("cb") / (col("c1") * col("c2"))),
            9).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(20)
    },
    Some("WITH tk AS (SELECT string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents), bg AS (SELECT ws[i + 1] AS w1, ws[i + 2] AS w2 FROM tk, unnest(range(len(ws) - 1)) AS u(i)), nn AS (SELECT count(*) AS n FROM bg), cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2 HAVING count(*) >= 5), c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1), c2 AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY 1) SELECT w1, w2, CAST(cb AS BIGINT) AS cb, round(ln(CAST(nn.n AS DOUBLE) * cb / (c1.c1 * c2.c2)), 9) AS pmi FROM cb JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN nn ORDER BY pmi DESC, w1, w2 LIMIT 20"))

  /** AN7 — robust scaling ([[graft.operators.Drift.robustScale]]):
    * (x − median)/IQR per event-type group, the outlier-insensitive
    * standardization. Group-sized percentile model broadcast back, one
    * narrow projection; oracle recomputes both quantiles with
    * quantile_cont (Spark `percentile` is the same interpolated
    * definition).
    */
  /** AN8 — exponentially time-decayed counts (recency-weighted
    * popularity: each event contributes exp(−0.1·Δdays) against the
    * corpus max date — the freshness signal behind trending/decay
    * ranking). The 1-row max-date model broadcasts onto the scan (the
    * PSI totals pattern — never a corpus-wide window); per-row weights
    * quantize at 9 and the sum at 4 so both engines agree to the hash.
    */
  val an8DecayedCounts = Q(
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"))
      val maxd = ev.agg(max(col("d")).as("maxd"))
      ev.crossJoin(broadcast(maxd))
        .select(col("event_type"),
          round(exp(lit(-0.1) * datediff(col("maxd"), col("d"))), 9).as("w"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("w")), 4).as("decayed_count"))
    },
    Some("WITH e AS (SELECT event_type, CAST(ts AS DATE) AS d FROM events), mx AS (SELECT max(d) AS maxd FROM e), " +
      "w AS (SELECT event_type, round(exp(-0.1 * date_diff('day', d, maxd)), 9) AS w FROM e CROSS JOIN mx) " +
      "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, round(sum(w), 4) AS decayed_count FROM w GROUP BY 1"))

  /** EWMA spike detection over daily event volumes — the
    * ops-analytics anomaly monitor beside `an8`'s decayed totals: per
    * (event_type, day), today's count against the exponentially
    * weighted mean of all PRIOR days, flagged when it exceeds the
    * spike factor (1.2 here, sized so the fixture's natural daily
    * variation exercises BOTH flag branches; a production monitor
    * would run 2–3×). The
    * decayed-mean window uses the a^(t−s) = a^t·a^(−s) decomposition —
    * a^t cancels in the ratio, so two plain prior-row window sums
    * (x·a^(−s) and a^(−s)) give the exact EWMA with no recursion and
    * no per-row pow chain; the pow ULP washes out at the 4-decimal
    * hand-off. First day per type reports null/false (no prior).
    * Day-typed windows are per-type partitioned — never global.
    */
  val an10EwmaSpikes = Q(
    (s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"))
        .groupBy(col("event_type"), col("d"))
        .agg(count(lit(1)).cast("double").as("n"))
      val mind = daily.agg(min(col("d")).as("mind"))
      val idx = daily.crossJoin(broadcast(mind))
        .withColumn("__i", datediff(col("d"), col("mind")))
        .withColumn("__ia", pow(lit(1.0 / 0.7), col("__i")))
      val w = Window.partitionBy(col("event_type")).orderBy(col("__i"))
        .rowsBetween(Window.unboundedPreceding, -1)
      idx
        .withColumn("__num", sum(col("n") * col("__ia")).over(w))
        .withColumn("__den", sum(col("__ia")).over(w))
        .select(col("event_type"), col("d"), col("n").cast("long").as("n"),
          round(col("__num") / col("__den"), 4).as("ewma_prev"),
          coalesce(col("n") >
            lit(1.2) * round(col("__num") / col("__den"), 4),
            lit(false)).as("spike"))
    },
    Some("WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS n FROM events GROUP BY 1, 2), " +
      "mn AS (SELECT min(d) AS mind FROM daily), " +
      "ix AS (SELECT event_type, d, n, date_diff('day', mind, d) AS i, pow(1.0 / 0.7, date_diff('day', mind, d)) AS ia FROM daily CROSS JOIN mn), " +
      "ws AS (SELECT event_type, d, n, sum(n * ia) OVER (PARTITION BY event_type ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS num, " +
      "sum(ia) OVER (PARTITION BY event_type ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS den FROM ix) " +
      "SELECT event_type, d, CAST(n AS BIGINT) AS n, round(num / den, 4) AS ewma_prev, COALESCE(n > 1.2 * round(num / den, 4), false) AS spike FROM ws"))

  val an7RobustScale = Q(
    (s, dir) => graft.operators.Drift.robustScale(
      t(s, dir, "events").select(col("event_id"), col("event_type"),
        col("value")),
      groupCols = Seq("event_type"), valueCol = "value")
      .select(col("event_id"), col("event_type"), col("scaled")),
    Some("WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med, quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr FROM events GROUP BY 1) SELECT event_id, e.event_type AS event_type, CASE WHEN iqr = 0.0 THEN 0.0 ELSE round((value - med) / iqr, 4) END AS scaled FROM events e JOIN m ON e.event_type = m.event_type"))

  /** Quality-aware canonical selection: near-dup clusters keep their
    * BEST member (highest quality score, ties by smallest id) instead
    * of the smallest id — the policy a real curator wants (the cleanest
    * copy survives, not the one that happened to arrive first). One
    * min_by aggregate over the component labels; the corpus never
    * re-shuffles for the selection.
    */
  val dedupCanonicalQuality = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val comps = sharedStage(s, "minhash_comps", dir) {
        val pairs = sharedStage(s, "minhash_pairs", dir)(
          Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8))
        Clusters.connectedComponents(pairs, "id1", "id2",
          nodes = Some(docs.select(col("doc_id"))), idCol = "doc_id")
      }
      val scored = comps.join(
        docs.select(col("doc_id").as("id"),
          TextAnalysis.qualityScore(col("text")).as("quality")), Seq("id"))
      scored.groupBy(col("component"))
        .agg(
          min_by(col("id"),
            struct((-col("quality")).as("nq"), col("id"))).as("doc_id"),
          count(lit(1)).as("n_members"),
          max(col("quality")).as("quality"))
        .select(col("doc_id"), col("n_members"), col("quality"))
    },
    Some("WITH RECURSIVE t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word, generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS ord FROM documents), sh0 AS (SELECT doc_id, word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY ord) || ' ' || lead(word, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS sh FROM t), sh AS (SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), pairs AS (SELECT id1, id2 FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8), e AS (SELECT id1 AS s, id2 AS d FROM pairs UNION SELECT id2 AS s, id1 AS d FROM pairs), walk(id, lbl) AS (SELECT doc_id, doc_id FROM documents UNION SELECT e.d, w.lbl FROM walk w JOIN e ON e.s = w.id), comp AS (SELECT id, min(lbl) AS cluster FROM walk GROUP BY id), qb AS (SELECT doc_id, text, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS n, CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE) AS stophits, CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct FROM documents), q AS (SELECT doc_id, floor((least(1.0, n / 100.0) * 0.4 + least(1.0, stophits / n * 5.0) * 0.3 + (1.0 - punct / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality FROM qb), j AS (SELECT comp.id, comp.cluster, q.quality FROM comp JOIN q ON q.doc_id = comp.id), r AS (SELECT cluster, id, quality, row_number() OVER (PARTITION BY cluster ORDER BY quality DESC, id) AS rk, count(*) OVER (PARTITION BY cluster) AS nm FROM j) SELECT id AS doc_id, CAST(nm AS BIGINT) AS n_members, quality FROM r WHERE rk = 1"))

  /** AN1 — ordered funnel analysis (view → click → purchase): each
    * stage's first event must FOLLOW the previous stage's first event,
    * per user. Three keyed aggregates, each pruned to one event type
    * before its shuffle; stage tables are user-keyed (tiny) so the
    * chain joins broadcast. Output: (stage, n_users) — the conversion
    * report every product-analytics stack runs.
    */
  val an1Funnel = Q(
    (s, dir) => {
      val ev = t(s, dir, "events").select(
        col("user_id"), col("event_type"), col("ts"))
      def firstAfter(tpe: String, prev: DataFrame, prevTs: String,
          outTs: String): DataFrame =
        ev.where(col("event_type") === tpe)
          .join(broadcast(prev), Seq("user_id"))
          .where(col("ts") > col(prevTs))
          .groupBy(col("user_id")).agg(min(col("ts")).as(outTs))
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = firstAfter("click", v, "t1", "t2")
      val p = firstAfter("purchase", c, "t2", "t3")
      val counts = Seq(
        ("1_view", v), ("2_click", c), ("3_purchase", p))
        .map { case (n, df) => df.agg(lit(n).as("stage"),
          count(lit(1)).as("n_users")) }
      counts.reduce(_.unionAll(_))
    },
    Some("WITH v AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1), c AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v ON v.user_id = e.user_id WHERE event_type = 'click' AND ts > t1 GROUP BY 1), p AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN c ON c.user_id = e.user_id WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1) SELECT '1_view' AS stage, count(*) AS n_users FROM v UNION ALL SELECT '2_click', count(*) FROM c UNION ALL SELECT '3_purchase', count(*) FROM p"))

  /** AN2 — weekly cohort retention: users bucketed by first-activity
    * week, the matrix counts distinct users active k weeks after their
    * cohort week. One first-seen aggregate (user-keyed, broadcast back)
    * + one distinct-user count over (cohort, offset) — the standard
    * retention triangle.
    */
  /** AN9 — RFM segmentation: per user, recency (days behind the
    * corpus-max event), frequency, and monetary sum, each split at its
    * EXACT median into high/low, composed into the 3-digit segment
    * code marketing analytics reads. The medians are scalar
    * `percentile` aggregates broadcast back (1-row cross joins) — no
    * corpus-wide ntile window; the oracle mirrors with quantile_cont.
    */
  val an9RfmSegments = Q(
    (s, dir) => {
      val ev = t(s, dir, "events")
      val per = ev.groupBy(col("user_id"))
        .agg(max(unix_micros(col("ts"))).as("__last"),
          count(lit(1)).as("f"), round(sum(col("value")), 4).as("m"))
      val maxTs = ev.agg(max(unix_micros(col("ts"))).as("__mx"))
      val withR = per.crossJoin(broadcast(maxTs))
        .withColumn("r_days",
          floor((col("__mx") - col("__last")) / 86400000000L).cast("long"))
      val med = withR.agg(
        expr("percentile(r_days, 0.5)").as("__rm"),
        expr("percentile(f, 0.5)").as("__fm"),
        expr("percentile(m, 0.5)").as("__mm"))
      withR.crossJoin(broadcast(med))
        .select(col("user_id"), col("r_days"), col("f"), col("m"),
          (when(col("r_days") <= col("__rm"), 2).otherwise(1) * 100 +
            when(col("f") >= col("__fm"), 2).otherwise(1) * 10 +
            when(col("m") >= col("__mm"), 2).otherwise(1))
            .cast("int").as("segment"))
    },
    Some("WITH per AS (SELECT user_id, max(epoch_us(ts)) AS last_us, count(*) AS f, round(sum(value), 4) AS m FROM events GROUP BY 1), " +
      "mx AS (SELECT max(epoch_us(ts)) AS mxus FROM events), " +
      "r AS (SELECT user_id, (mxus - last_us) // 86400000000 AS r_days, f, m FROM per CROSS JOIN mx), " +
      "med AS (SELECT quantile_cont(r_days, 0.5) AS rm, quantile_cont(f, 0.5) AS fm, quantile_cont(m, 0.5) AS mm FROM r) " +
      "SELECT user_id, r_days, f, m, CAST((CASE WHEN r_days <= rm THEN 2 ELSE 1 END) * 100 + (CASE WHEN f >= fm THEN 2 ELSE 1 END) * 10 + (CASE WHEN m >= mm THEN 2 ELSE 1 END) AS INT) AS segment FROM r CROSS JOIN med"))

  val an2Cohort = Q(
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      ev.join(broadcast(cohort), Seq("user_id"))
        .withColumn("offset_wk",
          datediff(col("wk"), col("cohort_wk")).cast("int") / 7)
        .groupBy(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort"),
          col("offset_wk").cast("int").as("offset_wk"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    },
    Some("WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events), c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1) SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort, CAST(date_diff('day', cohort_wk, wk) // 7 AS INT) AS offset_wk, count(DISTINCT e.user_id) AS n_active FROM e JOIN c ON c.user_id = e.user_id GROUP BY 1, 2"))

  /** AN3 — event-type transition matrix (first-order Markov over each
    * user's journey): adjacent pairs from one user-partitioned ordered
    * window (deterministic (ts, event_id) order), then two tiny
    * aggregates — the matrix is |types|²-sized however large the event
    * log, so the probability join broadcasts.
    */
  val an3Transitions = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = t(s, dir, "events")
        .select(col("user_id"), col("event_type").as("cur"),
          lag(col("event_type"), 1).over(w).as("prev"))
        .where(col("prev").isNotNull)
      val counts = pairs.groupBy(col("prev"), col("cur"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy(col("prev"))
        .agg(sum(col("n")).as("tot"))
      counts.join(broadcast(totals), "prev")
        .select(col("prev"), col("cur"), col("n"),
          round(col("n").cast("double") / col("tot"), 4).as("p"))
    },
    Some("WITH pr AS (SELECT user_id, event_type AS cur, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events), c AS (SELECT prev, cur, count(*) AS n FROM pr WHERE prev IS NOT NULL GROUP BY 1, 2), t AS (SELECT prev, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1) SELECT c.prev, c.cur, c.n, round(c.n / t.tot, 4) AS p FROM c JOIN t USING (prev)"))

  /** AN4 — population-stability drift between snapshots
    * ([[graft.operators.Drift]]): the reference (¾ of events) defines
    * quintile bins; the current snapshot (¼, with an injected
    * scale+shift drift) is scored per bin. Thresholds are a driver-held
    * model; each side pays one bucket projection + k-row count.
    */
  val an4DriftPsi = Q(
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("value"))
      val ref = ev.where(col("user_id") % 4 =!= 0).select(col("value"))
      val cur = ev.where(col("user_id") % 4 === 0)
        .select((col("value") * 1.15 + 2).as("value"))
      graft.operators.Drift.psi(ref, cur, "value", k = 5)
    },
    Some("WITH ref AS (SELECT value AS v FROM events WHERE user_id % 4 <> 0), cur AS (SELECT value * 1.15 + 2 AS v FROM events WHERE user_id % 4 = 0), th AS (SELECT quantile_cont(v, [0.2, 0.4, 0.6, 0.8]) AS t FROM ref), rb AS (SELECT CASE WHEN v <= t[1] THEN 0 WHEN v <= t[2] THEN 1 WHEN v <= t[3] THEN 2 WHEN v <= t[4] THEN 3 ELSE 4 END AS bucket FROM ref, th), cb AS (SELECT CASE WHEN v <= t[1] THEN 0 WHEN v <= t[2] THEN 1 WHEN v <= t[3] THEN 2 WHEN v <= t[4] THEN 3 ELSE 4 END AS bucket FROM cur, th), rc AS (SELECT bucket, count(*) AS n_ref FROM rb GROUP BY 1), cc AS (SELECT bucket, count(*) AS n_cur FROM cb GROUP BY 1), j AS (SELECT bucket, COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur FROM rc FULL OUTER JOIN cc USING (bucket)) SELECT CAST(bucket AS INT) AS bucket, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur, round((greatest(n_ref / sum(n_ref) OVER (), 1e-6) - greatest(n_cur / sum(n_cur) OVER (), 1e-6)) * ln(greatest(n_ref / sum(n_ref) OVER (), 1e-6) / greatest(n_cur / sum(n_cur) OVER (), 1e-6)), 9) AS psi_term FROM j"))

  /** AN5 — robust outlier detection ([[Drift.madOutliers]]): modified
    * z-score by per-type median/MAD (immune to the outliers it hunts);
    * outliers planted at user_id % 97 in both engines. Two group-sized
    * percentile models broadcast back; the data pays two narrow
    * projections.
    */
  val an5OutliersMad = Q(
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          when(col("user_id") % 97 === 0, col("value") * 25)
            .otherwise(col("value")).as("value"))
      graft.operators.Drift.madOutliers(ev, Seq("event_type"), "value")
        .select(col("event_id"), col("event_type"), col("value"), col("z"))
    },
    Some("WITH ev AS (SELECT event_id, event_type, CASE WHEN user_id % 97 = 0 THEN value * 25 ELSE value END AS value FROM events), med AS (SELECT event_type, quantile_cont(value, 0.5) AS m FROM ev GROUP BY 1), mad AS (SELECT e.event_type, quantile_cont(abs(e.value - m.m), 0.5) AS mad FROM ev e JOIN med m USING (event_type) GROUP BY 1) SELECT e.event_id, e.event_type, e.value, round(0.6745 * (e.value - m.m) / d.mad, 4) AS z FROM ev e JOIN med m USING (event_type) JOIN mad d USING (event_type) WHERE CASE WHEN d.mad = 0 THEN e.value <> m.m ELSE abs(round(0.6745 * (e.value - m.m) / d.mad, 4)) > 3.5 END"))

  /** AN6 — batch sessionization ([[graft.operators.Sessionize]]): each
    * user's event stream split at >30-min inactivity gaps and rolled up
    * to per-session stats — the batch twin of `st_session_window`. One
    * (user)-keyed sort carries both window passes (gap flag + running
    * session number); the roll-up groups on a superset key. Microsecond
    * epochs on both sides: DuckDB truncates the TIMESTAMP_NS parquet
    * column to µs on read, and Spark's `unix_micros(ts)` applies the
    * identical `div 1000` truncation — bit-exact gap arithmetic without
    * the oracle seeing nanos it cannot represent.
    */
  val an6Sessionize = Q(
    (s, dir) => graft.operators.Sessionize.stats(
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us")),
      Seq("user_id"), "ts_us", "event_id", gapNs = 1800L * 1000000L)
      .select(col("user_id"), col("session_no"), col("n_events"),
        col("start_ts").as("start_us"), col("duration").as("dur_us")),
    Some("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tn FROM events), g AS (SELECT user_id, event_id, tn, CASE WHEN lag(tn) OVER (PARTITION BY user_id ORDER BY tn, event_id) IS NULL OR tn - lag(tn) OVER (PARTITION BY user_id ORDER BY tn, event_id) > 1800000000 THEN 1 ELSE 0 END AS op FROM e), s AS (SELECT user_id, tn, sum(op) OVER (PARTITION BY user_id ORDER BY tn, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no FROM g) SELECT user_id, CAST(session_no AS BIGINT) AS session_no, count(*) AS n_events, min(tn) AS start_us, CAST(max(tn) - min(tn) AS BIGINT) AS dur_us FROM s GROUP BY 1, 2"))

  /** S13 — keyed parquet upsert ([[ParquetDataset.upsert]]): MERGE for
    * plain parquet. Base = ¾ of events; updates = the even-keyed half
    * with shifted values — so the upsert exercises both halves of MERGE
    * (updates of existing keys AND inserts of new ones) and the
    * read-back must equal the CASE-merged oracle. The REQUIRE pins that
    * only touched partitions were rewritten.
    */
  val s13Upsert = Q(
    (s, dir) => {
      val tmp = scratchPath("graft_s13").toString
      val all = t(s, dir, "events").select(
        col("event_id"), col("user_id"), col("value"),
        col("event_type").as("assessmentid"))
      ParquetDataset.write(all.where(col("event_id") % 4 =!= 0), tmp,
        partitionCols = Seq("assessmentid"))
      // pin one partition as untouched: updates exclude 'error' events
      val untouchedBefore = s.read.parquet(tmp).inputFiles
        .filter(_.contains("assessmentid=error")).sorted.toSeq
      val updates = all.where(col("event_id") % 2 === 0 &&
          col("assessmentid") =!= "error")
        .withColumn("value", col("value") + 1000.0)
      ParquetDataset.upsert(s, tmp, updates,
        keyCols = Seq("event_id"), partitionCols = Seq("assessmentid"))
      val untouchedAfter = s.read.parquet(tmp).inputFiles
        .filter(_.contains("assessmentid=error")).sorted.toSeq
      require(untouchedAfter == untouchedBefore,
        "upsert rewrote a partition absent from the updates")
      ParquetDataset.read(s, tmp)
        .select(col("event_id"), col("user_id"), col("value"),
          col("assessmentid"))
    },
    Some("SELECT event_id, user_id, CASE WHEN event_id % 2 = 0 AND event_type <> 'error' THEN value + 1000.0 ELSE value END AS value, event_type AS assessmentid FROM events WHERE event_id % 4 <> 0 OR (event_id % 2 = 0 AND event_type <> 'error')"))

  /** S14 — WebDataset-style tar shard round-trip ([[TarShards]]): the
    * standard sequential-read layout for multi-TB multimodal training
    * corpora. Documents become `{key}.txt` + `{key}.cls` members in
    * size-bounded ustar shards (pure-JVM writer, system-tar-compatible,
    * mtime pinned to 0 so shard bytes are reproducible); the entry reads
    * the shards back through Spark's binaryFile source and the ustar
    * parser, decoding every member — so a writer that drops a member,
    * mis-sizes a header, or splits a key across shards hash-fails
    * against the oracle's member list re-derived from the base table.
    */
  val s14TarShards = Q(
    (s, dir) => {
      val tmp = scratchPath("graft_s14").toString
      val df = t(s, dir, "documents").select(
        concat(lit("doc_"), col("doc_id")).as("key"),
        col("text"), col("lang"))
      TarShards.write(df, tmp, "key",
        Seq("text" -> "txt", "lang" -> "cls"), numShards = 8)
      TarShards.read(s, tmp).toDF()
        .select(col("key"), col("ext"),
          col("data").cast("string").as("payload"))
    },
    Some("SELECT 'doc_' || doc_id AS key, 'txt' AS ext, text AS payload FROM documents UNION ALL SELECT 'doc_' || doc_id AS key, 'cls' AS ext, lang AS payload FROM documents"))

  /** S16 — WARC source ([[graft.sources.Warc]]): documents are wrapped
    * as HTTP-response records in multi-member `.warc.gz` segment files
    * executor-side (one gzip member per record — the Common Crawl
    * layout), then read back through the distributed WARC scan:
    * per-file sequential parse, Content-Length framing, HTTP
    * header/body split. The byte-exact text round-trip through the
    * framing plus the parsed status/URI is what the oracle pins.
    */
  /** Fixture dirs keyed by (sf dir, fixture kind): the WARC corpora are
    * pure functions of the documents table, so bench passes and repeat
    * entries reread the first build instead of re-gzipping 5k records
    * (the `lshIndexCache` discipline).
    */
  val warcFixtureCache =
    scala.collection.concurrent.TrieMap[(String, String), String]()

  def cachedWarcFixture(dir: String, kind: String)(
      df: => DataFrame): String =
    warcFixtureCache.getOrElseUpdate((dir, kind), warcFixture(df))

  /** Write (uri, body) rows as multi-member `.warc.gz` segment files
    * (one gzip member per record, a warcinfo preamble per file — the
    * Common Crawl layout) under a fresh temp dir; returns the dir.
    */
  def warcFixture(df: DataFrame): String =
    warcFixtureInto(df,
      scratchPath("graft_warc").toString)

  /** Same, into a caller-owned dir (UUID segment names never collide,
    * so successive drops into one dir model an arriving crawl feed).
    */
  def warcFixtureInto(df: DataFrame, tmp: String): String = {
    df.repartition(8)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val fos = new java.io.FileOutputStream(new java.io.File(
            tmp, s"seg-${java.util.UUID.randomUUID()}.warc.gz"))
          try {
            // each member gzips into a buffer and CLOSES its stream
            // (finish() alone leaks one native Deflater per record)
            def member(rec: Array[Byte]): Unit = {
              val buf = new java.io.ByteArrayOutputStream(rec.length / 2 + 64)
              val g = new java.util.zip.GZIPOutputStream(buf)
              g.write(rec)
              g.close()
              buf.writeTo(fos)
            }
            member(Warc.warcinfoRecord("2026-01-01T00:00:00Z",
              "software: graft\r\n"))
            it.foreach { r =>
              member(Warc.httpResponseRecord(r.getString(0),
                "2026-01-01T00:00:00Z", s"<urn:uuid:${r.getString(0)}>",
                r.getString(1).getBytes(
                  java.nio.charset.StandardCharsets.UTF_8)))
            }
          } finally fos.close()
        }
      }
    tmp
  }

  val s16Warc = Q(
    (s, dir) => {
      val tmp = cachedWarcFixture(dir, "text") {
        t(s, dir, "documents").select(
          concat(lit("http://"), col("source"), lit(".example.com/doc/"),
            col("doc_id")).as("uri"),
          col("text"))
      }
      Warc.read(s, s"$tmp/*.warc.gz")
        .where(col("warc_type") === "response")
        .select(
          regexp_extract(col("target_uri"), "doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("target_uri"), col("http_status"),
          col("payload").cast("string").as("text"))
    },
    Some("SELECT doc_id, 'http://' || source || '.example.com/doc/' || " +
      "doc_id AS target_uri, 200 AS http_status, text FROM documents"))

  /** SimHash fingerprints (md5-digit bit votes), oracle-recomputable. */
  val dedupSimhash = Q(
    (s, dir) => SimHash.fingerprints(t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("simhash")),
    Some("WITH w0 AS (SELECT DISTINCT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w FROM documents), w AS (SELECT doc_id, md5(w) AS h FROM w0), bits AS (SELECT doc_id, i, CASE WHEN sum(CASE WHEN strpos('89abcdef', substr(h, i, 1)) > 0 THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END AS bit FROM w, generate_series(1, 16) AS g(i) GROUP BY doc_id, i) SELECT doc_id, string_agg(bit, '' ORDER BY i) AS simhash FROM bits GROUP BY doc_id"))

  /** SimHash Hamming-radius near-dup: 64-bit fingerprints (4 bits per
    * md5 digit), block-bucketed candidates (pairs within distance d agree
    * on one of d+1 16-bit blocks), exact popcount verification. Oracle is
    * the brute-force all-pairs Hamming filter over the same fingerprints.
    */
  val dedupSimhashNear = Q(
    (s, dir) => SimHash.nearPairs(
      t(s, dir, "documents"), "doc_id", "text", maxDist = 3, bitsPerDigit = 4),
    Some("WITH w0 AS (SELECT DISTINCT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w FROM documents), w AS (SELECT doc_id, md5(w) AS h FROM w0), bits AS (SELECT doc_id, i, CASE WHEN sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, CAST((i - 1) // 4 + 1 AS INT), 1)) - 1 >> CAST(3 - ((i - 1) % 4) AS INT)) % 2) = 1 THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END AS bit FROM w, generate_series(1, 64) AS g(i) GROUP BY doc_id, i), fp AS (SELECT doc_id, string_agg(bit, '' ORDER BY i) AS simhash FROM bits GROUP BY doc_id), pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, a.simhash AS f1, b.simhash AS f2 FROM fp a JOIN fp b ON a.doc_id < b.doc_id), d AS (SELECT id1, id2, count(*) FILTER (WHERE substr(f1, CAST(i AS INT), 1) <> substr(f2, CAST(i AS INT), 1)) AS dist FROM pairs CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) s GROUP BY 1, 2) SELECT id1, id2, CAST(dist AS INT) AS dist FROM d WHERE dist <= 3"))

  // --------------------------------------------------------------------
}
