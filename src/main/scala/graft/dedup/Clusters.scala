package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup-cluster resolution: turn pairwise near-duplicate matches into
  * connected components, so each group of mutually-similar documents keeps
  * exactly one canonical representative. This is the step after
  * [[Dedup.minhashPairs]] in a corpus-dedup pipeline — pairs alone
  * over-delete (A~B and B~C must keep one of {A,B,C}, not drop both B
  * and C's partners independently).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round every node takes the minimum label among itself
  * and its neighbors. Converges in O(component diameter) rounds — near-dup
  * components are dense and shallow (diameter ≲ 3 in practice), so this
  * beats the O(log n) large-star/small-star scheme on its constant factor
  * while staying fully distributed: each round is ONE job — the shuffle
  * join (edges × labels) materialized by the eager `localCheckpoint`
  * (which truncates lineage so plans don't grow with iteration count),
  * with the convergence scalar riding that same job as an observed
  * metric. The driver sees only that scalar, never row data.
  *
  * Convergence test: labels only ever decrease, so Σ labels (exact, as
  * decimal — no ANSI overflow) strictly decreases until the fixpoint;
  * equal consecutive sums ⟺ no label changed.
  */
object Clusters {

  /** Connected components of the undirected graph given by `edges`.
    *
    * @param edges  pair list; endpoints must be non-null
    * @param src    left endpoint column (any orderable numeric/long type)
    * @param dst    right endpoint column
    * @param nodes  optional full node universe (one column named `id`'s
    *               source column `idCol`); pass it to get singleton
    *               components for unmatched nodes — otherwise only edge
    *               endpoints appear
    * @return (id, component) — component = min node id of the component
    */
  def connectedComponents(
      edges: DataFrame, src: String, dst: String,
      nodes: Option[DataFrame] = None, idCol: String = "id",
      maxIter: Int = 50): DataFrame = {
    val ends = edges.select(col(src).as("src"), col(dst).as("dst"))
    // undirected: propagate along both directions; localCheckpoint once —
    // the edge list is re-joined every round
    val und = ends
      .union(ends.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    // iterate over edge ENDPOINTS only: a node with no edge is its own
    // component and needs no propagation rounds. In corpus dedup the edge
    // set is orders of magnitude smaller than the node universe, so the
    // per-round join/aggregate touches |endpoints| rows, not |corpus|;
    // singletons are attached in one final left join.
    val endpoints = und.select(col("src").as("id")).distinct()
    var labels = endpoints.select(col("id"), col("id").as("lbl"))
      .localCheckpoint()
    var prevSum: java.math.BigDecimal = null
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val nbrMin = und
        .join(labels.select(col("id").as("src"), col("lbl")), "src")
        .groupBy(col("dst").as("id")).agg(min(col("lbl")).as("nlbl"))
      // the convergence sum rides the (already mandatory) eager-checkpoint
      // materialization job as an observed metric, so each round costs
      // exactly ONE action — no separate aggregate round-trip
      val obs = org.apache.spark.sql.Observation()
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .observe(obs, sum(col("lbl").cast("decimal(38,0)")).as("s"))
        .localCheckpoint()
      // empty universe: zero rows yield a null sum (or, with zero tasks,
      // no metric at all); normalize so it converges immediately
      val s = obs.get.getOrElse("s", null) match {
        case null => java.math.BigDecimal.ZERO
        case d: java.math.BigDecimal => d
        case d: scala.math.BigDecimal => d.bigDecimal
      }
      converged = prevSum != null && prevSum.compareTo(s) == 0
      prevSum = s
      labels = next
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter " +
      "rounds — component diameter exceeds the iteration budget")
    nodes match {
      case Some(n) =>
        n.select(col(idCol).as("id")).distinct()
          .join(labels, Seq("id"), "left")
          .select(col("id"), coalesce(col("lbl"), col("id")).as("component"))
      case None =>
        labels.select(col("id"), col("lbl").as("component"))
    }
  }

  /** Leakage-safe train/val/test split: hash-split on the NEAR-DUP
    * COMPONENT label instead of the document id, so a document and its
    * near-duplicates land on the same side by construction — the split
    * every eval-honest pipeline needs (an id-level split of a corpus
    * with near-dups puts one copy in train and its twin in test, and
    * the benchmark silently measures memorization). `pairs` is any
    * near-dup pair list ([[graft.dedup.Dedup.minhashPairs]],
    * [[SimHash]] bands, semantic pairs); singleton docs form their own
    * component and split exactly like a plain id hash-split. The hash
    * is the repo's md5-first-hex-char convention (so6_hash_split:
    * ≤'b' → train ~75%, ≤'d' → val ~12.5%, else test), applied to the
    * component id. Cost over the plain split: the component iteration —
    * edge-bounded, not corpus-bounded.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
      pairs: DataFrame, src: String = "id1", dst: String = "id2"): DataFrame = {
    val comps = connectedComponents(pairs, src, dst,
      nodes = Some(docs.select(col(idCol))), idCol = idCol)
    val d = substring(md5(col("component").cast("string")), 1, 1)
    comps.select(col("id"), col("component"),
      when(d <= "b", "train").when(d <= "d", "val")
        .otherwise("test").as("split"))
  }

  /** Leakage-safe K-fold assignment — [[leakageSafeSplit]]'s
    * cross-validation twin: every near-duplicate CLUSTER (not every
    * document) lands wholly in one of `k` folds, so no fold's
    * held-out set shares a near-dup with any training fold — the
    * leak that makes CV scores lie. Fold = the cluster id's md5
    * folded mod k (first 8 hex digits, the deterministic-coin
    * convention), so membership is stable across runs and across
    * cluster-membership-preserving re-partitions.
    *
    * Scale shape: the component iteration (edge-bounded pointer
    * doubling) plus one projection; nothing beyond
    * [[connectedComponents]]'s own shuffles.
    */
  def leakageSafeFolds(docs: DataFrame, idCol: String, k: Int,
      pairs: DataFrame, src: String = "id1", dst: String = "id2")
      : DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val comps = connectedComponents(pairs, src, dst,
      nodes = Some(docs.select(col(idCol))), idCol = idCol)
    comps.select(col("id"), col("component"),
      pmod(conv(substring(md5(col("component").cast("string")), 1, 8),
        16, 10).cast("long"), lit(k.toLong)).cast("int").as("fold"))
  }
}
