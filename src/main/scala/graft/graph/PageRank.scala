package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list — the link-graph authority signal behind
  * crawl frontier prioritization and domain-quality weighting
  * (Common-Crawl-derived corpora rank hosts by centrality before
  * sampling).
  *
  * Iterative relational form: each iteration is one edge-keyed join of
  * the rank table onto the (pre-degreed, once-materialized) edge list
  * plus one destination-keyed sum — both shuffles keyed by node id, so
  * the plan scales with edges, and rank state stays a node-sized
  * table. localCheckpoint truncates lineage per iteration (the
  * connected-components pattern: O(iters) plans, not one
  * exponentially-nested plan). Ranks quantize to 9 decimals every
  * iteration — the fixpoint arithmetic stays cross-engine-identical,
  * so an independent SQL re-derivation reproduces every iterate
  * exactly.
  *
  * Dangling mass (nodes with no out-edges) is dropped, not
  * redistributed — ranking order is unaffected for the curation use;
  * callers needing the stochastic-matrix invariant can add the
  * uniform reinjection term themselves.
  */
object PageRank {

  /** Run `iters` damped iterations from the uniform start; returns
    * (node, rank). Multi-edges contribute multiply — pass a
    * `.distinct()` edge list for simple-graph semantics.
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val nodes = edges.select(col(srcCol).as("node"))
      .union(edges.select(col(dstCol).as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    val outDeg = edges.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("deg"))
    // enrich edges with the source degree ONCE; every iteration reads
    // this materialized table instead of re-joining the degree
    val edgesDeg = edges
      .join(outDeg, edges(srcCol) === outDeg("node"))
      .select(col(srcCol).as("src"), col(dstCol).as("dst"), col("deg"))
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", round(lit(1.0 / n), 9))
    for (_ <- 1 to iters) {
      val in = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("mass"))
      ranks = nodes.join(in, Seq("node"), "left")
        .select(col("node"), round(
          lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("mass"), lit(0.0)), 9).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Synchronous label propagation over the undirected graph — the
    * community-detection signal (link farms, mirror clusters, mutually
    * citing template sites) that complements [[pagerank]]'s centrality:
    * PageRank says WHICH hosts matter, LPA says which hosts move
    * TOGETHER. Each node starts labeled with itself; each round every
    * node adopts the most frequent label among its neighbors (ties →
    * the smallest label; an isolated node keeps its label). A FIXED
    * iteration count replaces the usual run-to-convergence: synchronous
    * LPA can oscillate on bipartite structures, and a fixed schedule
    * plus total tie order makes every iterate deterministic — the same
    * quantized-fixpoint discipline as [[pagerank]], so an unrolled SQL
    * replay reproduces each round exactly.
    *
    * Shape per round: one edge-keyed join of the label table onto the
    * (once-materialized, symmetrized) edge list + one (node, label)
    * count + one node-keyed argmax — all keyed by node id; label state
    * stays a node-sized table and lineage truncates per round.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, nodes: Option[DataFrame] = None,
      idCol: String = "id"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val ends = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val und = ends
      .union(ends.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    // pass the full node universe (the connectedComponents contract) to
    // give link-less corpus members singleton communities — endpoints
    // alone silently drop them from the output
    val endpoints = und.select(col("src").as("node"))
    val universe = nodes match {
      case Some(n) => endpoints.union(n.select(col(idCol).as("node")))
      case None => endpoints
    }
    val nodesDf = universe.distinct().localCheckpoint()
    var labels = nodesDf.withColumn("lbl", col("node"))
    for (_ <- 1 to iters) {
      val counts = und
        .join(labels.select(col("node").as("dst"), col("lbl")), "dst")
        .groupBy(col("src").as("node"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      val next = counts.groupBy(col("node"))
        .agg(min_by(col("lbl"),
          struct((-col("cnt")).as("nc"), col("lbl"))).as("nlbl"))
      labels = labels.join(next, Seq("node"), "left")
        .select(col("node"), coalesce(col("nlbl"), col("lbl")).as("lbl"))
        .localCheckpoint()
    }
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) — the directional
    * complement of [[pagerank]]: an AUTHORITY is pointed at by good
    * hubs, a HUB points at good authorities. On a crawl graph the
    * authority score ranks content hosts and the hub score ranks
    * directory/aggregator hosts — crawl seeding wants both lists.
    * Each iteration: authority = in-sum of hub, L2-normalized, then
    * hub = out-sum of the NEW authority, L2-normalized (the classic
    * alternating update). Every sum, norm, and quotient quantizes to
    * 9 decimals (the [[pagerank]] fixpoint discipline) so an unrolled
    * SQL replay reproduces each iterate; the normalizer is a 1-row
    * aggregate broadcast back, never a global window. Per iteration:
    * two edge-keyed join+sums, score state stays node-sized,
    * lineage truncates per round.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    def normalized(scores: DataFrame, c: String): DataFrame = {
      val norm = scores.agg(
        round(sqrt(round(sum(col(c) * col(c)), 9)), 9).as("__n"))
      scores.crossJoin(broadcast(norm))
        .select(col("node"), round(col(c) / col("__n"), 9).as(c))
    }
    var state = nodes
      .select(col("node"), lit(1.0).as("auth"), lit(1.0).as("hub"))
    for (_ <- 1 to iters) {
      val authRaw = e
        .join(state.select(col("node").as("src"), col("hub")), "src")
        .groupBy(col("dst").as("node"))
        .agg(round(sum(col("hub")), 9).as("auth"))
      val auth = normalized(
        nodes.join(authRaw, Seq("node"), "left")
          .select(col("node"), coalesce(col("auth"), lit(0.0)).as("auth")),
        "auth")
      val hubRaw = e
        .join(auth.select(col("node").as("dst"), col("auth")), "dst")
        .groupBy(col("src").as("node"))
        .agg(round(sum(col("auth")), 9).as("hub"))
      val hub = normalized(
        nodes.join(hubRaw, Seq("node"), "left")
          .select(col("node"), coalesce(col("hub"), lit(0.0)).as("hub")),
        "hub")
      state = auth.join(hub, "node").localCheckpoint()
    }
    state.select(col("node"), col("auth"), col("hub"))
  }
}
