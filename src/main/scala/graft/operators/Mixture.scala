package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-based domain mixture sampling — the "data mixing" step
  * of a multilingual / multi-domain training pipeline: sampling
  * probability per domain ∝ (n_d / N)^α with α ∈ (0, 1], which
  * upweights low-resource domains relative to their natural frequency
  * (α = 1 is proportional sampling, α → 0 approaches uniform-by-domain).
  *
  * Scale shape: the domain table is a MODEL (one row per language /
  * source domain), so it may be aggregated small, broadcast back, and
  * its max quota read on the driver — the corpus itself only ever flows
  * through one hash aggregation and one salted bounded rank
  * ([[Salted.topKPerGroup]]; no window ever sees a whole domain).
  * Selection within a domain is an md5 rank of the row key: no RNG, the
  * same rows are chosen on every retry (cf. so6/so7/so10).
  */
object Mixture {

  /** Per-domain target counts: `quota_d = min(n_d,
    * floor(budget · n_d^α / Σ n^α + 0.5))` — capped at availability
    * (without-replacement semantics; α < 1 can ask a rare domain for
    * more rows than it has). Returns (domain, n, quota), one row per
    * domain, computed distributed.
    */
  def temperatureQuotas(df: DataFrame, domainCol: String,
      alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(budget > 0, "budget must be positive")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(
      sum(pow(col("n").cast("double"), alpha)).as("z"))
    counts.crossJoin(broadcast(total))
      .select(col(domainCol), col("n"),
        least(col("n"),
          floor(lit(budget.toDouble) *
            pow(col("n").cast("double"), alpha) / col("z") + 0.5)
            .cast("long")).as("quota"))
  }

  /** The mixture sample itself: `quota_d` rows per domain, chosen by
    * deterministic md5 rank within the domain. Output = input columns +
    * `rk` (1-based rank within the domain).
    */
  def sample(df: DataFrame, domainCol: String, idCol: String,
      alpha: Double, budget: Long, salts: Int = 16): DataFrame = {
    val quotas = temperatureQuotas(df, domainCol, alpha, budget)
      .withColumnRenamed(domainCol, "__mix_domain")
    // driver-held scalar from the domain-sized model frame (not the corpus)
    val maxQuota = quotas.agg(max(col("quota"))).head().getLong(0)
    require(maxQuota <= Int.MaxValue, "quota exceeds rank capacity")
    val ranked = Salted.topKPerGroup(df, Seq(domainCol),
      orderCols = Seq(md5(col(idCol).cast("string")), col(idCol)),
      k = math.max(1L, maxQuota).toInt, salts = salts)
    ranked.join(broadcast(quotas),
        ranked(domainCol) === quotas("__mix_domain"))
      .filter(col("rk") <= col("quota"))
      .drop("__mix_domain", "n", "quota")
  }

  /** Deterministic uniform negative sampling — the contrastive-pair
    * companion of [[graft.ann.Ann.hardNegatives]]: `k` pseudo-random
    * OTHER ids per anchor, drawn by hashing (anchor, draw-index) onto a
    * dense id ring `[0, n)`. No RNG state: the same negatives on every
    * run, retry, and engine (the md5 convention of so6/so7/so10). A
    * draw that lands on the anchor itself is dropped, not redrawn —
    * redraw loops aren't SQL-expressible and the per-anchor loss is at
    * most one of k draws with probability k/n. Pure projection +
    * explode: no join, no shuffle; `n` is caller-supplied (the dense-id
    * contract, e.g. the corpus row count after id densification).
    * Output: (anchor id, draw, neg_id).
    */
  def uniformNegatives(df: DataFrame, idCol: String, k: Int,
      n: Long): DataFrame = {
    require(k > 0 && n > 1, "need k > 0 and a ring larger than 1")
    df.select(col(idCol), explode(sequence(lit(0), lit(k - 1))).as("draw"))
      .withColumn("neg_id",
        pmod(conv(substring(md5(concat(col(idCol).cast("string"),
          lit("_"), col("draw").cast("string"))), 1, 12), 16, 10)
          .cast("long"), lit(n)))
      .where(col("neg_id") =!= col(idCol))
  }

  /** Token-budget mixture plan — the pretraining-data planning table:
    * given per-domain target WEIGHTS and a total token budget, report
    * per domain what's available, what the mixture wants
    * (`desired = floor(w_d · budget + 0.5)`), what one epoch can supply
    * (`planned = min(desired, available)`), the matching acceptance
    * rate, and the repetition count a full quota needs
    * (`epochs = ⌈desired / available⌉`, integer ceiling — the "how many times does
    * C4 repeat" number). One domain-keyed aggregate over the corpus;
    * the weight table is driver-sized, the join domain-keyed over a
    * handful of rows. Domains in the corpus but not in `weights` plan
    * to zero (excluded), which is the curation default; a weight whose
    * domain is ABSENT from the corpus (a typo'd mixture config) is not
    * silently dropped — it surfaces as an `available = 0, desired > 0`
    * row, an impossible plan line the caller's sanity gate
    * (`desired > 0 && available == 0`) catches before a run
    * under-allocates its budget.
    */
  def tokenBudgetPlan(df: DataFrame, domainCol: String, tokensCol: String,
      weights: Map[String, Double], budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toSeq.toDF("__dom", "__w")
    val avail = df.groupBy(col(domainCol))
      .agg(sum(col(tokensCol).cast("long")).as("available"))
    avail
      .join(w, avail(domainCol) === w("__dom"), "full_outer")
      .select(coalesce(col(domainCol), col("__dom")).as(domainCol),
        coalesce(col("available"), lit(0L)).as("available"),
        floor(coalesce(col("__w"), lit(0.0)) * budget + 0.5).cast("long")
          .as("desired"))
      .select(col(domainCol), col("available"), col("desired"),
        least(col("desired"), col("available")).as("planned"),
        when(col("available") === 0, lit(0.0))
          .otherwise(round(
            least(col("desired"), col("available")) /
              col("available").cast("double"), 4)).as("rate"),
        when(col("available") === 0 || col("desired") === 0, lit(0L))
          // Integer ceiling, not ceil(double-div): at token counts past
          // 2^53 the double quotient can land on k±ε and ceil off-by-one.
          .otherwise(expr("(desired + available - 1) div available"))
          .as("epochs"))
  }

  /** Deterministic mixture interleaving — the SCHEDULE the token-budget
    * plan feeds: given per-domain weights, in what order do examples
    * from each domain appear in the training stream so that every
    * prefix of the stream matches the target mixture (low-discrepancy
    * interleaving, the Bresenham line-drawing idea applied to data
    * loading)? Domain d's k-th example occupies budget slot
    * `slot = ⌈k / w_d⌉`: after any N slots, domain d has emitted
    * ⌊w_d · N⌋ ± 1 examples — the streaming-mixture guarantee batch
    * shuffling cannot give.
    *
    * Scale shape: one per-domain rank window (partitioned, never
    * global) and a closed-form slot expression. The output is keyed by
    * (slot, domain) — a total order a writer sorts by WITHIN its output
    * shards; deliberately NO dense global row_number, which would be a
    * single-task window at corpus scale. Domains absent from `weights`
    * (weight 0) are excluded, matching [[tokenBudgetPlan]]'s curation
    * default.
    */
  def interleavePlan(df: DataFrame, domainCol: String, orderCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    // "__w"-prefixed internals: a caller's own "w" column must neither
    // collide (AMBIGUOUS_REFERENCE) nor silently win resolution. "k" and
    // "slot" are the OUTPUT contract and intentionally overwrite.
    val w = weights.filter(_._2 > 0).toSeq.toDF("__dom", "__w")
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col(orderCol))
    df.join(broadcast(w), df(domainCol) === w("__dom"))
      .withColumn("k", row_number().over(rank).cast("long"))
      .select(col(domainCol), col(orderCol), col("k"),
        ceil(col("k") / col("__w")).cast("long").as("slot"))
  }

  /** Expand the [[tokenBudgetPlan]] into the CONCRETE repeated-document
    * schedule — "C4 repeats 2.3×" as an actual (doc, epoch) multiset a
    * loader can read: every document of domain d appears in epochs
    * 1..⌊desired/available⌋ in full, and the final partial epoch takes
    * the deterministic md5-ranked PREFIX of the domain's documents
    * whose exclusive running token sum is still below the remainder
    * (the weighted-sample prefix convention — no RNG, stable across
    * retries). Unweighted domains, zero-desired domains, AND
    * zero-available domains (the plan's impossible available=0 /
    * desired>0 sanity-gate row) all expand to nothing.
    *
    * Scale shape: the plan is domain-keyed (model-sized, broadcast
    * back); the expansion is one partitioned rank window plus an
    * explode bounded by the epoch count — output rows = Σ_d docs_d ×
    * epochs_d, which is the size of the thing being materialized, not
    * overhead.
    */
  def epochExpand(df: DataFrame, domainCol: String, idCol: String,
      tokensCol: String, weights: Map[String, Double],
      budget: Long): DataFrame = {
    val plan = tokenBudgetPlan(
        df.select(col(domainCol), col(tokensCol)),
        domainCol, tokensCol, weights, budget)
      .withColumn("__full",
        when(col("available") === 0 || col("desired") === 0, lit(0L))
          .otherwise(expr("desired div available")))
      // available = 0 is the impossible-plan row (tokenBudgetPlan's
      // sanity-gate case): it must expand to NOTHING — a naive
      // desired − full·available remainder would sweep every zero-token
      // doc into a bogus "partial epoch"
      .withColumn("__rem",
        when(col("available") === 0, lit(0L))
          .otherwise(col("desired") - col("__full") * col("available")))
      .select(col(domainCol), col("__full"), col("__rem"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col("__h"), col(idCol))
    // join the (broadcast, domain-keyed) plan BEFORE hashing/windowing:
    // unweighted domains drop ahead of the per-domain sort, so the
    // cumsum window never runs over rows the plan discards (Catalyst
    // cannot push an inner join below a Window)
    val ranked = df
      .select(col(domainCol), col(idCol),
        col(tokensCol).cast("long").as("__t"))
      .join(broadcast(plan), domainCol)
      .withColumn("__h", md5(concat(col(idCol).cast("string"), lit(":"),
        col(domainCol))))
      .withColumn("__cum",
        coalesce(sum(col("__t")).over(
          w.rowsBetween(Long.MinValue, -1)), lit(0L)))
    val fullEpochs = ranked.where(col("__full") >= 1)
      .select(col(domainCol), col(idCol),
        explode(sequence(lit(1L), col("__full"))).as("epoch"))
    val partial = ranked.where(col("__cum") < col("__rem"))
      .select(col(domainCol), col(idCol),
        (col("__full") + 1).as("epoch"))
    fullEpochs.unionAll(partial)
  }

  /** Curriculum staging: within each group (a language, a domain),
    * documents rank by a difficulty/quality score and split into
    * `stages` equal bands — the easy→hard ordering a curriculum
    * schedule trains through, assigned deterministically ((score, id)
    * tie-break) so re-runs and the oracle agree on every boundary row.
    * `ntile` follows the SQL-standard remainder rule (the first
    * n mod stages bands get one extra row) on both engines.
    *
    * Scale shape: one group-partitioned rank window — the same
    * per-group sort any curriculum assignment needs; no global
    * ordering, no driver state. Groups are the parallelism unit, so
    * the widest task holds the largest group, not the corpus.
    */
  def curriculumStages(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, stages: Int): DataFrame = {
    require(stages >= 2, s"need at least 2 stages, got $stages")
    df.select(col(groupCol), col(idCol),
        col(scoreCol).cast("double").as("score"))
      .withColumn("stage", ntile(stages).over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("score"), col(idCol))))
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis 2006): draw `k` rows where each row's
    * inclusion probability is proportional to its weight — "sample 100k
    * documents, long documents proportionally more often" — without an
    * RNG, a scan order, or a driver loop. Each row gets the ES key
    * u^(1/w) with u a seeded md5-derived uniform (first 8 hex digits /
    * 2³²; the so6/so7 coin convention), and the global top-k by key IS
    * the weighted sample — one expression per row, one TakeOrdered.
    *
    * Determinism across engines: ranking uses the key ROUNDED to 9
    * decimals with the id as tie-break (pow differs by an ulp across
    * libms; at 9 decimals the md5-spread keys collide with negligible
    * probability and ties still order). Zero/negative weights are
    * excluded up front — ES gives them key 0 anyway; excluding them
    * keeps 1/w finite.
    *
    * Scale shape: a pure per-row projection then TakeOrderedAndProject
    * (k-bounded heap per partition, k-sized driver merge — no global
    * sort); the final rank window runs on the k-row result, not the
    * corpus. Output: (id, weight, es_key, rk).
    *
    * Relation to [[WeightedSample.take]] (the so10 entry): the SAME
    * sampler — top-k by u^(1/w) and bottom-k by −ln(u)/w are
    * equivalent orderings of the one ES draw. This form adds the
    * caller seed, the rank column, and the mergeable-state streaming
    * twin ([[graft.streaming.StreamingIngest.weightedSampleDrain]]);
    * that form keeps the exponential key whose VALUES are the
    * Poisson-process arrival times priority sampling reports.
    */
  /** Exact-quota stratified split — the guarantee hash splits can't
    * give: `so6`-style md5-threshold routing only APPROXIMATES its
    * proportions (a 20-row stratum under a 10% val threshold holds
    * 0–5 val rows, binomially), while evaluation design usually needs
    * "exactly ⌈10%⌉ of EVERY language in val". Rows rank within their
    * stratum by seeded md5 (the deterministic-shuffle convention) and
    * the split boundaries are per-stratum ceilings of the cumulative
    * fractions: train gets rows 1..⌈f₁n⌉, val ⌈f₁n⌉+1..⌈(f₁+f₂)n⌉,
    * test the rest — every stratum splits to the exact rounded quota,
    * independent of corpus layout.
    *
    * Scale shape: one rank window PARTITIONED by the stratum (never
    * global) over a (stratum, count) broadcast — the curriculum/shard
    * shape; nothing wider than (id, stratum, rank) shuffles.
    */
  def stratifiedExactSplit(df: DataFrame, idCol: String,
      stratumCol: String, fractions: Seq[(String, Double)],
      seed: String): DataFrame = {
    require(fractions.size >= 2, "need at least two split labels")
    require(fractions.map(_._1).distinct.size == fractions.size,
      s"duplicate split labels: ${fractions.map(_._1)}")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    require(fractions.forall(_._2 > 0), "every fraction must be > 0")
    val ranked = df.select(col(idCol), col(stratumCol))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(md5(concat(col(idCol).cast("string"), lit(":"),
            lit(seed))), col(idCol))))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col(stratumCol))))
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val label = fractions.map(_._1).zip(cum)
      .foldLeft(lit(null).cast("string")) { case (acc, (name, c)) =>
        when(acc.isNotNull, acc)
          // round-9 before ceil: 0.8·20 is 16.000000000000004 in IEEE
          // and must mean 16, not 17
          .otherwise(when(
            col("__rk") <= ceil(round(lit(c) * col("__n"), 9)),
            lit(name)))
      }
    ranked.select(col(idCol), col(stratumCol), label.as("split"))
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyed = df
      .where(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).as("weight"))
      .withColumn("es_key", round(pow(
        conv(substring(md5(concat(col(idCol).cast("string"),
          lit(":"), lit(seed))), 1, 8), 16, 10).cast("double") /
          lit(4294967296.0),
        lit(1.0) / col("weight").cast("double")), 9))
    keyed.orderBy(col("es_key").desc, col(idCol).asc).limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("es_key").desc, col(idCol).asc)).cast("int"))
  }
}
