package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan audit: the properties that make these queries survive a
  * 100× scale-up are plan shapes, not results — pruned scans, pushed
  * filters, broadcast joins where one side is small, whole-stage codegen
  * in the hot path, and no cartesian product outside the intentional
  * broadcast cross joins. Asserting them here keeps query evolution from
  * silently regressing the plans (`runMain graft.Explain` prints them for
  * human review).
  *
  * Only side-effect-free registry entries are audited — sink round-trips
  * (s1/s3/s4/st_*) execute jobs at plan-construction time.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(FormattedMode)

  private def df(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("q1_agg: pruned scan feeding a partial hash aggregate under codegen") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"))
    // the formatted AQE plan hides codegen spans until execution; ask the
    // codegen printer directly
    val cg = df("q1_agg").queryExecution
      .explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(cg.contains("WholeStageCodegen"))
    // column pruning reached the parquet footer: only the 2 grouped/
    // aggregated columns are read, not all 16 lineitem columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_comment"))
  }

  test("p5_filter: predicate is pushed to the parquet scan") {
    val p = plan("p5_filter")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).get
    assert(pushed.contains("IsNotNull") || pushed.contains("GreaterThan"),
      s"no pushed filters in: $pushed")
  }

  test("j1_broadcast_join: dimension side broadcast, no shuffle join") {
    val p = plan("j1_broadcast_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("j2_anti_join: anti join stays a broadcast hash join") {
    val p = plan("j2_anti_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"))
  }

  test("j4_map_lookup: reference lookup is a broadcast join, not a collect") {
    val p = plan("j4_map_lookup")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("no unintended cartesian products anywhere") {
    // ANN/brute-pair queries are intentional broadcast *nested-loop* cross
    // joins (scored top-k / thresholded pairs); a CartesianProduct node —
    // the shuffle-both-sides form — must never appear.
    val audited = Seq("q1_agg", "j1_broadcast_join", "j3_union_diff",
      "a2_dedup_keep_latest", "dedup_jaccard", "dedup_minhash",
      "ann_topk", "ann_ivf_topk", "ann_neardup", "r1_relationalize",
      "text_quality", "mm_featurize", "text_repetition", "dedup_spans",
      "dedup_spans_winnowed", "dedup_semantic", "a12_grouping_sets",
      "so9_quantile_buckets")
    audited.foreach { n =>
      assert(!plan(n).contains("CartesianProduct"),
        s"$n contains a CartesianProduct")
    }
  }

  test("round-10 additions: partitioned windows only, no cartesians, " +
      "and the overlap matrix caps via a broadcast anti-join") {
    // shuffle/shard and interleave rank inside partitioned windows —
    // never the corpus-wide single-task window shape
    Seq("corpus_shuffle_shard", "mix_interleave", "pref_majority_vote",
      "privacy_k_anon", "pref_bradley_terry", "mix_epoch_expand",
      "text_adaptive_length_filter").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n:\n$p")
      assert(globalWindowLines(p).isEmpty, s"$n:\n$p")
    }
    // the adaptive filter's bounds and the epoch plan are model-sized
    // tables broadcast BACK onto the corpus — never a shuffle join
    assert(plan("text_adaptive_length_filter").contains("BroadcastHashJoin"))
    assert(plan("mix_epoch_expand").contains("BroadcastHashJoin"))
    // mean pooling is ONE hash aggregate; the round-11 long-format
    // hand-off posexplodes ABOVE it (|docs|·dim rows, the
    // driver-sortable contract) — the chunk stream itself still never
    // explodes, and no window appears
    val mp = plan("ann_mean_pool")
    assert(mp.contains("HashAggregate") || mp.contains("ObjectHashAggregate"),
      mp)
    assert(!mp.contains("Window"), mp)
    val mpLines = mp.linesIterator.toSeq
    val genIdx = mpLines.indexWhere(_.contains("Generate"))
    val aggIdx = mpLines.indexWhere(_.contains("HashAggregate"))
    assert(genIdx >= 0 && aggIdx >= 0 && genIdx < aggIdx,
      s"posexplode must sit above (earlier in formatted output than) " +
        s"the pooling aggregate:\n$mp")
    // the overlap matrix's capped postings are materialized
    // (localCheckpoint) before the pair join, so the audited tail is
    // joins-of-aggregates over the spilled postings; the cap's
    // left_anti itself runs at materialization time — audit it on the
    // UNCHECKPOINTED construction instead
    val om = plan("corpus_overlap_matrix")
    assert(!om.contains("CartesianProduct"))
    assert(globalWindowLines(om).isEmpty, om)
    import org.apache.spark.sql.functions.{col, count, lit}
    val grams = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source").as("src"), col("text"))
      .select(col("src"),
        org.apache.spark.sql.functions.explode(
          graft.dedup.Dedup.shinglesOfTokens(
            org.apache.spark.sql.functions.split(
              org.apache.spark.sql.functions.lower(col("text")), "\\s+"),
            3)).as("g"))
      .distinct()
    val hot = grams.groupBy(col("g")).agg(count(lit(1)).as("__df"))
      .where(col("__df") > lit(10)).select(col("g"))
    val capPlan = grams.join(hot, Seq("g"), "left_anti")
      .queryExecution.explainString(FormattedMode)
    // the ubiquitous-gram drop must not shuffle the postings: the hot
    // list is tiny, so Spark plans the left_anti as a broadcast join
    assert(capPlan.contains("BroadcastHashJoin") &&
      capPlan.contains("LeftAnti"), capPlan)
  }

  test("j5: bucket-co-located join plans with zero shuffle exchanges") {
    import org.apache.spark.sql.functions.col
    val tmp = graft.EntryKit.scratchTracked("graft_j5_spec").toString
    spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$tmp/c").saveAsTable("j5_spec_cust")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"), col("o_totalprice"))
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$tmp/o").saveAsTable("j5_spec_ord")
    val p = EntriesRelational.bucketedJoin(
      spark.table("j5_spec_cust"), spark.table("j5_spec_ord"))
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("SortMergeJoin"))
    // bucketing makes both the join AND the bucket-key aggregation
    // exchange-free; per-run sorts are also skipped (sortBy at write)
    assert(!p.contains("Exchange"), s"unexpected shuffle in:\n$p")
  }

  test("j8: declarative interval join planned by the injected strategy, " +
      "not a nested loop") {
    val p = plan("j8_interval_join")
    assert(p.contains("BroadcastIntervalJoin"), s"strategy did not fire:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("s4 output: partition predicates prune the hive-partitioned scan") {
    import org.apache.spark.sql.functions._
    val tmp = graft.EntryKit.scratchTracked("graft_s4_prune").toString
    val df = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("event_type").as("assessmentid"),
        year(col("ts")).as("year"), month(col("ts")).as("month"),
        dayofmonth(col("ts")).as("day"))
    graft.sources.ParquetDataset.write(df, tmp)
    val rd = graft.sources.ParquetDataset.read(spark, tmp)
      .where(col("assessmentid") === "view" && col("month") === 1)
    val p = rd.queryExecution.explainString(FormattedMode)
    val pf = p.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse(fail(s"no PartitionFilters line in plan:\n$p"))
    assert(pf.contains("assessmentid") && pf.contains("month"),
      s"partition predicates not pruned: $pf")
    // and they must NOT degrade to data filters over a full scan
    assert(rd.count() > 0)
  }

  test("corpus_curation: one scan, one shuffle, no UDF in the plan") {
    val p = plan("corpus_curation")
    // all three scoring expressions ride the single documents scan; the
    // dedup aggregate is the only exchange (a SortAggregate — min_by's
    // struct buffer is not hash-aggregable — but still map-side partial)
    def nodes(kind: String) =
      p.linesIterator.count(_.matches(s"\\(\\d+\\) $kind\\s*"))
    assert(nodes("Scan parquet") == 1, p)
    assert(nodes("Exchange") == 1, p)
    // column expressions only — a BatchEvalPython/ScalaUDF here would
    // mean a scoring stage fell out of codegen
    assert(!p.contains("UDF"), p)
  }

  test("corpus_neardup_curation: keep-set stage shuffles component " +
      "labels, never the corpus — no cartesian, bounded exchanges") {
    // the pair stage runs eagerly inside connectedComponents (banded LSH
    // + localCheckpoint); the plan under audit is everything AFTER it:
    // label aggregate + corpus rejoin. That tail must contain no
    // nested-loop/cartesian and at most 3 exchanges (agg + join sides) —
    // a full-corpus shuffle outside the pair stage would show up here.
    val p = plan("corpus_neardup_curation")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    val exchanges = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange\\s*"))
    assert(exchanges <= 3, s"unexpected exchange count $exchanges:\n$p")
  }

  test("dedup_contamination: decoration joins stay keyed — no cartesian " +
      "or nested loop (join STRATEGY is AQE's runtime call: broadcast " +
      "when pairs are few, shuffle when contamination is heavy)") {
    val p = plan("dedup_contamination")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("an6_sessionize: the user-keyed sort carries both window passes " +
      "and the session roll-up — exactly one exchange, no extra sort " +
      "for the superset-keyed aggregate") {
    val p = plan("an6_sessionize")
    val exchanges = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange\\s*"))
    assert(exchanges == 1, s"expected the single user_id exchange, " +
      s"got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j12_interval_overlap: both sides bin-exploded into a keyed " +
      "equi-join — never a nested loop") {
    val p = plan("j12_interval_overlap")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_containment: counted inverted index stays a keyed join " +
      "with a map-side-combined count — no cartesian, no nested loop") {
    val p = plan("dedup_containment")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count"), p)
  }

  test("text_ngrams: top-k is TakeOrdered, never a global sort") {
    val p = plan("text_ngrams")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("text_pack_sequences: one exchange — the pack-group shuffle " +
      "feeds window and aggregate without a second one") {
    val p = plan("text_pack_sequences")
    val exchanges = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange\\s*"))
    assert(exchanges == 1, s"expected the single grp exchange, got $exchanges:\n$p")
    assert(!p.contains("UDF"), p)
  }

  test("text_bm25: top-k is TakeOrdered; idf table broadcasts; no " +
      "cartesian product") {
    val p = plan("text_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ann_pq_topk: code scan never shuffles; ranking is the only " +
      "exchange past the scored rows") {
    val p = plan("ann_pq_topk")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ann_topk: queries broadcast; corpus side never shuffles for the join") {
    val p = plan("ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("ann_maxsim_topk: query token matrices broadcast; the corpus " +
      "side never shuffles for the scoring join; no cartesian; no UDF " +
      "in the hot path") {
    val p = plan("ann_maxsim_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // scoring is HOF folds over the native dot product — any UDF here
    // would drop the pair loop out of codegen
    assert(!p.contains("UDF"), p)
  }

  test("dedup_minhash: signature aggregate is map-side partial") {
    val p = plan("dedup_minhash")
    // partial min() signatures combine before the shuffle — the signature
    // stage's shuffle volume is rows, not (rows × shingles)
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2)
  }

  test("dedup_minhash_saturated: the entry's replicated fixture genuinely " +
      "engages the g×g hot-bucket decomposition, with exact pair parity") {
    import graft.dedup.Dedup
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the entry's fixture, verbatim: 8 base docs × 64 byte-identical
    // replicas (SparkEntry.dedupMinhashSaturated)
    val sat = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 8)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(63))).as("k"))
      .select((col("doc_id") * 1000 + col("k")).cast("long").as("doc_id"),
        col("text"))
    // engagement: every replica group saturates its (band, bh) buckets
    // past the entry's maxBucketSize = 8 → chunk fan-out g = ⌈64/8⌉ = 8
    val census = Dedup.oversizedBandBuckets(sat, "doc_id", "text",
        maxBucketSize = 8)
      .select(col("n"), col("g")).as[(Long, Int)].collect()
    assert(census.nonEmpty, "no oversized bucket — the guard never engaged")
    assert(census.exists(_._2 >= 8),
      s"max chunk fan-out ${census.map(_._2).max} < 8 — saturation too weak")
    // parity: the decomposed entry produces EXACTLY the undecomposed
    // pair set — the claim the oracle hash rides on
    val salted = SparkEntry.queries("dedup_minhash_saturated")(spark, sfDir)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    val unsalted = Dedup.minhashPairs(sat, "doc_id", "text", 0.8,
        maxBucketSize = Int.MaxValue)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    assert(salted == unsalted)
    assert(salted.nonEmpty)
  }

  test("a2_dedup_keep_latest: single-pass max_by aggregate, no window sort") {
    val p = plan("a2_dedup_keep_latest")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
    assert(!p.contains("Window"))
  }

  test("a10_sketches: sketch branch rejoins by broadcast and no aggregate " +
      "carries imperative sketches per user") {
    val p = plan("a10_sketches")
    assert(p.contains("BroadcastHashJoin"))
    // the regression this guards: countDistinct's first-level aggregate is
    // keyed (event_type, user_id); if the HLL/percentile aggs ride along,
    // every per-USER group materializes a 52-long sketch buffer. Split
    // correctly, no ObjectHashAggregate groups by user_id.
    assert(!p.linesIterator
      .sliding(4).exists(w => w.exists(_.contains("ObjectHashAggregate")) &&
        w.exists(l => l.trim.startsWith("Keys") && l.contains("user_id"))),
      "an ObjectHashAggregate is keyed by user_id — sketch buffers " +
        "are being built per user")
  }

  test("dedup_clusters: iterative rounds stay join+aggregate, never " +
      "cartesian, and edges are checkpoint-backed") {
    val out = df("dedup_clusters")
    val p = out.queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"))
    // the returned frame is the converged localCheckpoint — re-consuming
    // it (bench does, twice) must not replay the iterations
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      s"expected a checkpoint-backed result, got:\n$p")
  }

  test("dedup_semantic: pair stage reads the checkpointed assignment, " +
      "joins stay keyed, and no rank window appears anywhere") {
    // the assignment (broadcast centroids + min_by argmax) executes into
    // a localCheckpoint at construction; the returned plan must read that
    // checkpoint on both self-join legs rather than re-assigning
    val p = plan("dedup_semantic")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), "a rank window crept into the pair stage")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("span-dup entries: postings census joins stay keyed; the winnowed " +
      "selection never adds a shuffle over the full span stream") {
    Seq("dedup_spans", "dedup_spans_winnowed").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n:\n$p")
      // census postings come from the checkpoint, not a re-tokenize
      assert(p.contains("Scan ExistingRDD"), s"$n lost its posting cut:\n$p")
    }
  }

  test("text_dsir_weights: the log-ratio model joins back BROADCAST — " +
      "the corpus profile never shuffles for the scoring join") {
    val p = plan("text_dsir_weights")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the profile is checkpointed once and reused by marginal + scoring
    assert(p.contains("Scan ExistingRDD"), s"profile cut lost:\n$p")
  }

  test("scd2_history: lead rides the lag's (key, version) sort — one " +
      "exchange, no second shuffle for the second window") {
    val p = plan("scd2_history")
    val exchanges = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange\\s*"))
    assert(exchanges == 1, s"expected one user_id exchange, got $exchanges:\n$p")
  }

  test("cdc_snapshot_diff: keyed full-outer join, never a nested loop") {
    val p = plan("cdc_snapshot_diff")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("inc_agg_merge: every merge stage is a partial hash aggregate " +
      "(map-side combined), no window, no sort-based fallback") {
    val p = plan("inc_agg_merge")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("mm/audio near-dup: banded fingerprint self-joins are keyed — " +
      "no cartesian, no nested loop, dedup after verify") {
    Seq("mm_image_neardup", "mm_audio_neardup").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$n:\n$p")
    }
  }

  test("j13_fuzzy_join: deletion-neighborhood blocking keeps candidate " +
      "generation an equi-join — no cartesian, no nested loop") {
    val p = plan("j13_fuzzy_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_contamination_ngram: held-out gram set broadcasts — the " +
      "train-side gram stream never shuffles for the verdict join") {
    val p = plan("dedup_contamination_ngram")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("text_vocab_coverage: vocabulary head is a distributed top-k " +
      "(TakeOrdered), never a corpus-wide global sort") {
    val p = plan("text_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the only Sort allowed is the ≤max(ks)-row window after the limit;
    // a global Sort over the full vocabulary would appear as a Sort
    // directly above the word-count aggregate feeding a rangepartitioning
    assert(!p.contains("rangepartitioning"), p)
  }

  test("dedup_spans_clean: postings join back keyed — no cartesian, " +
      "no nested loop on the rewrite path") {
    val p = plan("dedup_spans_clean")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("analytics/CDC tier: no cartesian, no nested-loop join, no " +
      "corpus-wide window (every Window is partitioned or post-limit)") {
    // the tier restored by the round-8 loader fix had no plan pins;
    // these are the three silent scale-killers for event-shaped data
    Seq("an1_funnel", "an2_cohort", "an3_transitions", "an4_drift_psi",
      "an5_outliers_mad", "an6_sessionize", "an7_robust_scale",
      "cdc_snapshot_diff", "cdc_apply_diff", "scd2_history",
      "inc_agg_merge", "j12_interval_overlap", "so11_winsorize",
      "w2_rolling_window", "a2_dedup_keep_latest", "a5_sample_per_group",
      "a6_max_per_group", "chat_template_render",
      "chat_alternation_audit").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n:\n$p")
      // an explicit Cross nested-loop is the intentional driver-sized
      // model broadcast (totals/threshold rows); any OTHER nested loop
      // is an accidental non-equi fallback. The plan TREE line carries
      // the join type ("BroadcastNestedLoopJoin Cross BuildRight (n)");
      // the detail-section header repeats the node name bare, so only
      // audit tree lines (those with the "+-"/":-" connectors or a
      // leading tree position).
      p.linesIterator
        .filter(l => l.contains("BroadcastNestedLoopJoin") &&
          (l.contains("+-") || l.contains(":-")))
        .foreach(l => assert(l.contains("Cross"), s"$n: $l\n$p"))
      // an unpartitioned Window prints an EMPTY partition-spec list in its
      // formatted detail ("Arguments: [exprs], [], [order]") — assert
      // directly on the spec instead of the old SinglePartition/
      // TakeOrderedAndProject disjunction, which passed whenever a
      // TakeOrdered appeared anywhere in the plan
      val globals = globalWindowLines(p)
      assert(globals.isEmpty,
        s"$n has a corpus-wide (unpartitioned) window:\n" +
          globals.mkString("\n") + s"\n$p")
    }
  }

  /** Window detail lines whose partition spec is empty — the corpus-wide
    * window shape (all rows through one task). A Window node's formatted
    * detail prints `Arguments: [exprs], [partitionSpec], [orderSpec]`,
    * and an EMPTY spec is omitted entirely — the PARTITION spec when the
    * window is global, but equally the ORDER spec when the window is
    * partitioned-unordered (max/min over a partition), so a plain
    * group-count test false-positives on the latter. Disambiguate the
    * 2-group case by what the trailing group holds: sort orders always
    * print a direction (`ASC`/`DESC`), partition columns never do.
    */
  private def globalWindowLines(p: String): Seq[String] = {
    def topLevelGroups(s: String): Seq[String] = {
      var depth = 0
      val out = scala.collection.mutable.Buffer[String]()
      val cur = new StringBuilder
      for (c <- s) c match {
        case '[' =>
          if (depth == 0) cur.clear() else cur += c
          depth += 1
        case ']' =>
          depth -= 1
          if (depth == 0) out += cur.toString else cur += c
        case ')' => depth -= 1; if (depth > 0) cur += c
        case '(' => if (depth > 0) cur += c; depth += 1
        case c => if (depth > 0) cur += c
      }
      out.toSeq
    }
    def isGlobal(line: String): Boolean = {
      val gs = topLevelGroups(line)
      if (gs.size >= 3) false // all three specs printed -> partitioned
      else if (gs.size == 2)
        // [exprs], [orderSpec] = global; [exprs], [partitionSpec] = fine.
        // Anchor the direction token: an order spec entry ends in
        // `expr ASC|DESC [NULLS FIRST|LAST]`; a bare substring match
        // would misfire on a partition expression whose printed form
        // merely CONTAINS "ASC" (e.g. a column or literal named so).
        " (ASC|DESC)( NULLS (FIRST|LAST))?\\s*(,|$)".r
          .findFirstIn(gs(1)).isDefined
      else true // only the window exprs: no partition, no order
    }
    var inWindow = false
    val out = scala.collection.mutable.Buffer[String]()
    for (l <- p.linesIterator) {
      val t = l.trim
      if (t.matches("\\(\\d+\\) Window\\s*")) inWindow = true
      else if (t.matches("\\(\\d+\\) .*")) inWindow = false
      if (inWindow && t.startsWith("Arguments:") && isGlobal(t))
        out += t
    }
    out.toSeq
  }

  test("crawl/classifier tier: link extraction and mojibake repair stay " +
      "shuffle-free projections; classifier scoring broadcasts the model") {
    // text_html_links: fixture projection → Generate → filter, one stage
    val links = plan("text_html_links")
    assert(!links.contains("Exchange"), links)
    assert(!links.contains("CartesianProduct"))
    // text_fix_mojibake: the native expression rides a narrow projection
    val moji = plan("text_fix_mojibake")
    assert(!moji.contains("Exchange"), moji)
    assert(moji.contains("graft_repair_mojibake"), moji)
    // text_quality_model: the trained model joins back BROADCAST (driver-
    // sized, never a shuffle join); the per-doc margin aggregate and the
    // feature census are the only exchanges; no cartesian anywhere
    val qm = plan("text_quality_model")
    assert(qm.contains("BroadcastHashJoin"), qm)
    assert(!qm.contains("CartesianProduct"))
  }

  test("the global-window detector itself fires on a deliberately " +
      "unpartitioned window (guards the guard against vacuity)") {
    import org.apache.spark.sql.functions.{col, sum}
    val global = spark.range(10).select(col("id"),
      sum(col("id")).over(org.apache.spark.sql.expressions.Window
        .orderBy("id")).as("s"))
    val gp = global.queryExecution.explainString(FormattedMode)
    assert(globalWindowLines(gp).nonEmpty,
      s"detector failed to flag a global window:\n$gp")
    val partitioned = spark.range(10).select(col("id"),
      sum(col("id")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("id") % 2).orderBy("id")).as("s"))
    val pp = partitioned.queryExecution.explainString(FormattedMode)
    assert(globalWindowLines(pp).isEmpty,
      s"detector false-positived on a partitioned window:\n$pp")
    // partitioned-but-UNORDERED window (max over partition): the order
    // spec is the omitted group here, not the partition spec
    val unordered = spark.range(10).select(col("id"),
      org.apache.spark.sql.functions.max(col("id")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("id") % 2)).as("m"))
    val up = unordered.queryExecution.explainString(FormattedMode)
    assert(globalWindowLines(up).isEmpty,
      s"detector false-positived on a partitioned-unordered window:\n$up")
    // global UNORDERED window (corpus-wide max) must still flag
    val gu = spark.range(10).select(col("id"),
      org.apache.spark.sql.functions.max(col("id")).over(org.apache.spark.sql.expressions.Window
        .partitionBy()).as("m"))
    val gup = gu.queryExecution.explainString(FormattedMode)
    assert(globalWindowLines(gup).nonEmpty,
      s"detector failed to flag a global unordered window:\n$gup")
  }

  test("graph tier: LPA and HITS iterate over node-sized checkpointed " +
      "state — no cartesian, no corpus-wide window in the final plan") {
    // the per-round jobs run at construction (localCheckpoint); the
    // audited plan is the final round's tail and must stay keyed
    Seq("graph_lpa", "graph_hits", "graph_pagerank").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n:\n$p")
      assert(globalWindowLines(p).isEmpty, s"$n:\n$p")
    }
  }

  test("pref tier: pair build reduces in ONE prompt-keyed aggregate — no " +
      "window, no cartesian; the audit's window partitions by prompt") {
    val pb = plan("pref_pair_build")
    assert(pb.linesIterator.exists(_.matches("\\(\\d+\\) \\w*HashAggregate\\s*")) ||
      pb.contains("SortAggregate"), pb)
    assert(!pb.linesIterator.exists(_.matches("\\(\\d+\\) Window\\s*")), pb)
    assert(!pb.contains("CartesianProduct"))
    val pa = plan("pref_pair_audit")
    assert(!pa.contains("CartesianProduct"))
    assert(globalWindowLines(pa).isEmpty,
      s"pair audit window must partition by prompt:\n$pa")
    // eval-side contamination: gram-keyed joins only, never a cartesian,
    // and no corpus-wide window anywhere
    val cf = plan("dedup_contamination_frac")
    assert(!cf.contains("CartesianProduct"))
    assert(globalWindowLines(cf).isEmpty, cf)
  }

  test("pure-projection entries never shuffle: zero Exchange in the " +
      "plan — these scale as a single map pass no matter the corpus") {
    Seq("web_url_canonical", "text_html_extract", "text_quality_rules",
      "so12_zorder", "so13_negative_sample",
      "text_normalize", "text_pii_redact", "so6_hash_split",
      "so7_stratified_sample").foreach { n =>
      val p = plan(n)
      val exchanges = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange\\s*"))
      assert(exchanges == 0, s"$n should be narrow, found $exchanges:\n$p")
      assert(!p.contains("CartesianProduct"), s"$n:\n$p")
    }
    // the codec-tier projections widen deliberately: exactly ONE
    // round-robin exchange (task parallelism for dense inputs), never a
    // keyed shuffle
    val p = plan("ann_random_projection")
    val ex = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange\\s*"))
    assert(ex == 1, s"widen should be the only exchange, found $ex:\n$p")
    assert(p.contains("RoundRobinPartitioning"), p)
  }

  test("round-10 second-wave entries: metric/audit folds stay keyed and " +
      "broadcast — no cartesian, no global window, heads distributed") {
    // kappa + length bias: keyed hash aggregates, scalar 1×1 crosses only
    val fk = plan("pref_fleiss_kappa")
    assert(fk.contains("HashAggregate"), fk)
    assert(!fk.contains("CartesianProduct") && globalWindowLines(fk).isEmpty, fk)
    val lb = plan("pref_length_bias")
    assert(!lb.contains("CartesianProduct") && globalWindowLines(lb).isEmpty, lb)
    // retrieval metrics: the |Q|·k run and query labels broadcast into
    // the corpus-sized label join — broadcast hash, never sort-merge
    val rm = plan("ann_retrieval_metrics")
    assert(rm.contains("BroadcastHashJoin"), rm)
    assert(!rm.contains("SortMergeJoin") && !rm.contains("CartesianProduct"), rm)
    assert(globalWindowLines(rm).isEmpty, rm)
    // binary topk: scoring is the deliberate broadcast NLJ (the ann_topk
    // shape); candidate/rerank windows stay per-query partitioned
    val bt = plan("ann_binary_topk")
    assert(bt.contains("BroadcastNestedLoopJoin"), bt)
    assert(!bt.contains("SortMergeJoin") && globalWindowLines(bt).isEmpty, bt)
    // key skew: the top-10 head is a distributed TakeOrdered, never a
    // global sort of the key histogram
    val ks = plan("profile_key_skew")
    assert(ks.contains("TakeOrderedAndProject"), ks)
    assert(!ks.linesIterator.exists(_.matches("\\(\\d+\\) Sort\\s*")), ks)
    // fertility: lang-keyed partial+final aggregate, no window
    val tf = plan("text_token_fertility")
    assert(tf.linesIterator.count(_.contains("HashAggregate")) >= 2, tf)
    assert(globalWindowLines(tf).isEmpty, tf)
    // pack efficiency: the packing window partitions by pack group
    val pe = plan("text_pack_efficiency")
    assert(globalWindowLines(pe).isEmpty, pe)
    assert(!pe.contains("CartesianProduct"), pe)
    // template dedup + char entropy: keyed hash aggregates, no window
    Seq("dedup_template", "text_entropy").foreach { n =>
      val p = plan(n)
      assert(p.contains("HashAggregate"), s"$n:\n$p")
      assert(!p.contains("CartesianProduct") &&
        globalWindowLines(p).isEmpty, s"$n:\n$p")
    }
    // curriculum + gap fill: group-partitioned windows only
    Seq("mix_curriculum", "w3_gap_fill").foreach { n =>
      val p = plan(n)
      assert(globalWindowLines(p).isEmpty, s"$n:\n$p")
      assert(!p.contains("CartesianProduct"), s"$n:\n$p")
    }
    // bootstrap: the 40-row replicate frame broadcasts (the deliberate
    // NLJ); the corpus side never sort-merges
    val bc = plan("eval_bootstrap_ci")
    assert(bc.contains("BroadcastNestedLoopJoin"), bc)
    assert(!bc.contains("SortMergeJoin"), bc)
    // centroid drift: tiny model join — keyed or broadcast, no cartesian
    val cd = plan("ann_centroid_drift")
    assert(!cd.contains("CartesianProduct"), cd)
    // RFM: medians are scalar aggregates broadcast back — never a
    // corpus-wide ntile window
    val rfm = plan("an9_rfm_segments")
    assert(globalWindowLines(rfm).isEmpty, rfm)
    assert(!rfm.linesIterator.exists(_.matches("\\(\\d+\\) Window\\s*")), rfm)
    // pass@k + scene arithmetic entries: keyed aggregates, no cartesian
    Seq("eval_pass_at_k", "text_code_score").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct") &&
        globalWindowLines(p).isEmpty, s"$n:\n$p")
    }
  }

  test("round-11 entries: domain models broadcast, heads take-ordered, " +
      "class windows partitioned, no cartesian") {
    // t-closeness: sensitive-domain model + 1-row n broadcast in; the
    // class-total window partitions by the quasi tuple, never globally
    val tc = plan("privacy_t_closeness")
    assert(tc.contains("BroadcastExchange"), tc)
    assert(!tc.contains("CartesianProduct") &&
      globalWindowLines(tc).isEmpty, tc)
    // ES weighted sample: the corpus reduces through a distributed
    // TakeOrdered heap — no full Sort; the rank window runs on the
    // k-row head (the one deliberate post-limit global window)
    val ws = plan("mix_weighted_sample")
    assert(ws.contains("TakeOrderedAndProject"), ws)
    assert(!ws.contains("SortMergeJoin") && !ws.contains("CartesianProduct"),
      ws)
    // zipf: one (term, count) hash aggregate, TakeOrdered head, fit on
    // <= topN rows; the 1-row totals frame broadcasts
    val zf = plan("text_zipf_audit")
    assert(zf.contains("TakeOrderedAndProject") &&
      zf.contains("HashAggregate"), zf)
    assert(!zf.contains("CartesianProduct") ||
      zf.contains("BroadcastNestedLoopJoin"), zf)
    // knn outliers: scoring is the deliberate broadcast NLJ (ann_topk
    // shape); the per-row reduction is a keyed aggregate, no window
    val ko = plan("ann_knn_outliers")
    assert(ko.contains("BroadcastNestedLoopJoin"), ko)
    assert(!ko.contains("SortMergeJoin") && globalWindowLines(ko).isEmpty,
      ko)
    // lsh planner: bounded divisor x grid relation, no corpus scan at
    // all (zero parquet reads)
    val lp = plan("dedup_lsh_plan")
    assert(!lp.contains("Scan parquet"), lp)
    // triangles: the wedge and closing joins stay keyed — no cartesian
    // (the pre-checkpoint canonicalization executes eagerly; the
    // audited shape is the wedge/closing stage)
    val tr = plan("graph_triangles")
    assert(!tr.contains("CartesianProduct"), tr)
    assert(globalWindowLines(tr).isEmpty, tr)
    // exact-quota split: the rank window partitions by the stratum
    val ss = plan("so16_stratified_split")
    assert(globalWindowLines(ss).isEmpty && !ss.contains("CartesianProduct"),
      ss)
    // sitemap: domain-sized flatMap — no join, no window, no cartesian
    val sm = plan("web_sitemap_parse")
    assert(!sm.contains("CartesianProduct") &&
      globalWindowLines(sm).isEmpty, sm)
    // win matrix: one keyed game aggregate then pure arithmetic —
    // zero joins in the whole plan
    val wm = plan("pref_win_matrix")
    assert(!wm.contains("Join"), wm)
    assert(wm.contains("HashAggregate"), wm)
  }

  test("round-13 entries: self-kNN IVF shuffles both sides on the " +
      "cluster key (no corpus broadcast); batch mode broadcasts the " +
      "probed batch; seeding is one aggregate chain") {
    // self-gating (entry path, broadcastProbes = false): the scoring
    // join must be a shuffle join — a corpus-sized broadcast is exactly
    // the plan that dies at 100× (only the tiny centroid table may
    // broadcast, inside the probe-ranking cross join)
    for (name <- Seq("ann_knn_outliers_ivf", "ann_knn_outliers_ivf_pruned")) {
      val p = plan(name)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"$name: no shuffle join in\n$p")
      assert(!p.contains("CartesianProduct"), name)
    }
    // batch mode (serving shape): the nprobe-expanded 2-row batch
    // broadcasts; the corpus-side scan never shuffles for the scoring
    // join
    val batch = graft.ann.Ann.knnOutliersIvf(
      Tables.load(spark, sfDir, "embeddings"), "vec_id", "embedding",
      "label", k = 2, minSim = 0.5, nprobe = 2,
      queries = Some(Tables.load(spark, sfDir, "embeddings")
        .where(org.apache.spark.sql.functions.col("vec_id") < 2)))
      .queryExecution.explainString(FormattedMode)
    assert(batch.contains("BroadcastHashJoin"), batch)
    // unigram-LM seeding entry: word aggregate → substring explosion →
    // piece aggregate → TakeOrdered head; no join anywhere
    val ug = plan("text_unigram_lm")
    assert(!ug.contains("Join") && !ug.contains("CartesianProduct"), ug)
    assert(ug.contains("TakeOrderedAndProject"), ug)
    // ICP ordering/packing: both the in-cluster rank and the pack
    // cumsum are CLUSTER-partitioned windows — a global window here
    // would serialize the corpus through one task
    val icp = plan("corpus_icp_pack")
    assert(globalWindowLines(icp).isEmpty, icp)
  }

  test("round-14 entries: two-level assignment broadcasts only models " +
      "(supers, routed centroids) and never shuffles the corpus into a " +
      "join; no keyed exchange carries the embedding column") {
    val p = plan("ann_assign_two_level")
    // the corpus appears in BroadcastNestedLoopJoin legs only as the
    // STREAMED side against broadcast model tables; a SortMergeJoin of
    // the corpus against itself (or a cartesian) is the shape that
    // dies at 100×. The entry's final two-vs-flat comparison join is
    // id-keyed and may shuffle — that one is linear.
    assert(!p.contains("CartesianProduct"), p)
    // every broadcast exchange in the plan is a model table (supers /
    // centroids / routed centroids) — none of them scans embeddings
    val broadcastScans = p.linesIterator.filter(_.contains("Scan parquet"))
    assert(broadcastScans.nonEmpty)
    // the per-vector super-probe ranking must partition by the vector
    // id, never globally
    assert(globalWindowLines(p).isEmpty, p)
    assertNoVectorCarryingExchange(p)
    // same check on the routed SemDeDup plan — the round-14 router
    // reintroduced exactly this defect one function below the
    // semanticDedup fix, and the old audit missed it
    assertNoVectorCarryingExchange(plan("dedup_semantic_routed"))
    assertNoVectorCarryingExchange(plan("dedup_semantic"))
  }

  test("round-16: the coarse-assignment argmax is a PROJECTION on every " +
      "path — no aggregate and no keyed exchange in the assignment " +
      "subplan (flat literal, flat broadcast, routed, and the fused " +
      "lifecycle encode+assign that retrain/upsert/drain write through)") {
    import org.apache.spark.sql.functions.{array, col, lit, pmod}
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = graft.ann.Ann.pivotCentroids(
      emb, "label", "vec_id", "embedding")
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(FormattedMode)
    // the r15 profile's core finding, pinned as a tripwire: the argmax
    // aggregate (crossJoin + min_by) cost 20-40x its dot arithmetic;
    // any Aggregate reappearing under an assignment output means the
    // kernel regressed to that shape
    def assertProjectionOnly(tag: String, p: String): Unit = {
      for (agg <- Seq("HashAggregate", "ObjectHashAggregate",
          "SortAggregate")) assert(!p.contains(agg),
        s"$tag: aggregate in the assignment subplan\n$p")
      assert(!p.contains("hashpartitioning") &&
        !p.contains("rangepartitioning("),
        s"$tag: keyed exchange in the assignment subplan\n$p")
      assertNoVectorCarryingExchange(p)
    }
    assertProjectionOnly("flat_literal", fmt(graft.ann.Ann.assignClusters(
      emb, "vec_id", "embedding", cents, "label")))
    // force the broadcast dispatch: 200 centroids x 64 dims > the
    // 8192-cell literal budget
    val bigCents = emb.limit(200)
      .select(pmod(col("vec_id"), lit(100000)).cast("int").as("label"),
        col("embedding").cast("array<double>").as("centroid"))
    assertProjectionOnly("flat_broadcast", fmt(graft.ann.Ann.assignClusters(
      emb, "vec_id", "embedding", bigCents, "label")))
    assertProjectionOnly("routed", fmt(graft.ann.Ann.assignClustersTwoLevel(
      emb, "vec_id", "embedding", cents, "label",
      superCount = 3, nprobe = 2)))
    val cb = graft.ann.Ann.pqSeedCodebook(
      emb, "vec_id", "embedding", m = 8, ksub = 16)
    assertProjectionOnly("encode_assign", fmt(graft.ann.Ann.encodeAssign(
      emb, "vec_id", "embedding", cb, cents, "label")))
  }

  test("round-17: filtered search — the allowed-ids pre-filter is ONE " +
      "LeftSemi broadcast hash join ahead of the probed ADC scan, and " +
      "no keyed exchange carries an embedding or code column (the " +
      "scan shape both of the recall guard's passes build on, at a " +
      "narrow and a probe-all count)") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val emb = Tables.load(spark, sfDir, "embeddings")
    val docs = Tables.load(spark, sfDir, "documents")
    val cb = graft.ann.Ann.pqSeedCodebook(
      emb, "vec_id", "embedding", m = 8, ksub = 16)
    val indexed = graft.ann.Ann.pqEncode(emb, "vec_id", "embedding", cb)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
    val allowed = docs.where(pmod(col("doc_id"), lit(25)) === 7)
      .select(col("doc_id").as("vec_id"))
    val cents = graft.ann.Ann.pivotCentroids(
      emb, "label", "vec_id", "embedding")
    // audit the guard's scan shape in isolation, at the first-pass
    // probe count AND at probe-all
    for (np <- Seq(3, 10)) {
      val p = graft.ann.Ann.filteredScan(indexed, "vec_id", "label",
          cents, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          cb, k = 5, nprobe = np, allowed)
        .queryExecution.explainString(FormattedMode)
      val semis = p.linesIterator
        .filter(l => l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
        .toSeq
      assert(semis.size == 1,
        s"nprobe=$np: expected exactly one LeftSemi BHJ (the allowed " +
          s"pre-filter), got ${semis.size}\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        p)
      assertNoVectorCarryingExchange(p)
    }
    // and the REAL guarded operator end-to-end on a selective allowed
    // set (the escalation fires): the FUSED plan pays the LeftSemi
    // semi-join exactly once — the first pass's branch reads its
    // localCheckpoint, only the tail scores against the live index —
    // and the tail's ADC work covers only the unprobed clusters
    val guarded = graft.ann.Ann.ivfPqTopKFiltered(indexed, "vec_id",
      "label", cents, emb.filter(col("vec_id") < 10), "vec_id",
      "embedding", cb, k = 5, nprobe = 1, allowed)
    val gp = guarded.queryExecution.explainString(FormattedMode)
    assert(gp.contains("Union"),
      s"selective fixture must fire the escalation (no Union => no " +
        s"short queries)\n$gp")
    val gSemis = gp.linesIterator
      .filter(l => l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
      .toSeq
    assert(gSemis.size == 1,
      s"fused guard must pay the allowed semi-join ONCE, got " +
        s"${gSemis.size}\n$gp")
    assert(!gp.contains("SortMergeJoin") && !gp.contains("CartesianProduct"),
      gp)
    assertNoVectorCarryingExchange(gp)
  }

  /** No HASH/RANGE shuffle exchange may output an embedding-carrying
    * column: keyed exchanges multiply the corpus' vector bytes by the
    * stage's row fanout (the r14 two-level probe shuffled N·s rows each
    * carrying the full __v — a pure working-set tax). The deliberate
    * one-time [[graft.operators.Widen]] round-robin (local small-file
    * spread; a no-op on cluster-sized inputs) is exempt: the check
    * targets the partitioning kinds a join/window/aggregate inserts.
    */
  private def assertNoVectorCarryingExchange(p: String): Unit = {
    val vectorCols = Seq("__v#", "cv#", "sv#", "embedding#", "centroid#")
    val blocks = p.split("\n\\(").toSeq // details blocks: "(n) NodeName\n..."
    val offenders = blocks
      .filter(_.linesIterator.take(1).exists(_.matches("\\d+\\) Exchange\\s*")))
      .filter(b => b.contains("hashpartitioning") ||
        b.contains("rangepartitioning("))
      .filter(b => vectorCols.exists(b.contains))
    assert(offenders.isEmpty,
      s"keyed exchange carries an embedding column:\n${offenders.mkString("\n---\n")}")
  }
}
