package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Root-to-node path linearization over a parent-pointer forest — the
  * operator that turns a BRANCHING conversation store (each message
  * row pointing at its parent, multiple regenerated replies per
  * parent) into the linear root→leaf sequences an SFT pipeline
  * renders, and equally the category-tree / reply-tree flattening any
  * hierarchy-shaped table needs.
  *
  * Scale shape: POINTER DOUBLING, not parent-at-a-time walking. Each
  * round joins every unresolved node's chain onto its current
  * ancestor's chain, doubling the covered depth — a depth-d forest
  * resolves in ⌈log₂ d⌉ node-keyed equi-join rounds instead of d,
  * which at conversation depths of hundreds is the difference between
  * 8 shuffles and 300. Each round localCheckpoints (the repo's
  * iteration discipline: truncated lineage, no exponential plan
  * growth) and spends exactly ONE action — a single aggregate reading
  * (unresolved, dangling) — so the driver sees two scalars per round,
  * never row data.
  */
object TreePaths {

  /** One row per node: (node, root, depth, path) where `depth` is the
    * edge count from the root and `path` is the '/'-joined ids from
    * root to node. Roots carry a NULL parent; forests (many roots) are
    * fine. A dangling parent reference or a cycle raises
    * `IllegalStateException` (a cycle can never resolve; a dangling
    * parent would silently truncate its subtree's paths — both are
    * data defects the pipeline must hear about, not paper over).
    *
    * @param maxIters pointer-doubling round cap: resolves any forest
    *                 of depth ≤ 2^maxIters; the default 30 is "any
    *                 real hierarchy" while still bounding a cyclic
    *                 input to 30 rounds before the error.
    */
  def rootPaths(nodes: DataFrame, node: String, parent: String,
      maxIters: Int = 30): DataFrame = {
    // state invariant: `p` lists the chain from n upward, EXCLUDING
    // `anc`; once anc is null the chain has absorbed its root.
    var state = nodes
      .select(col(node).cast("long").as("n"),
        col(parent).cast("long").as("anc"))
      .withColumn("p", array(col("n")))
    val init = state.agg(count(lit(1)),
      sum(when(col("anc").isNotNull, 1L).otherwise(0L)),
      countDistinct(col("n"))).head()
    val total = init.getLong(0)
    // duplicate node ids would silently fan out the self-join into
    // duplicated/garbled paths — same fail-fast posture as the cycle
    // and dangling-pointer guards
    if (init.getLong(2) != total)
      throw new IllegalStateException(
        s"${total - init.getLong(2)} duplicate node id(s) in the " +
          "parent table — refusing to fan out the ancestor join")
    var unresolved = Option(init.get(1)).fold(0L)(_.asInstanceOf[Long])
    var it = 0
    while (unresolved > 0) {
      if (it >= maxIters)
        throw new IllegalStateException(
          s"$unresolved nodes unresolved after $maxIters pointer-doubling" +
            " rounds: cycle in the parent graph")
      val anc = state.select(col("n").as("__an"),
        col("anc").as("__aanc"), col("p").as("__ap"))
      state = state.join(anc, col("anc") === col("__an"), "left")
        .select(col("n"),
          when(col("anc").isNull, lit(null).cast("long"))
            .otherwise(col("__aanc")).as("anc"),
          when(col("anc").isNull, col("p"))
            .otherwise(concat(col("p"), col("__ap"))).as("p"),
          (col("anc").isNotNull && col("__an").isNull).as("__dangling"))
        .localCheckpoint()
      val counts = state.agg(
        sum(when(col("anc").isNotNull, 1L).otherwise(0L)),
        sum(when(col("__dangling"), 1L).otherwise(0L)),
        max(size(col("p")))).head()
      val dangling = Option(counts.get(1)).fold(0L)(_.asInstanceOf[Long])
      if (dangling > 0)
        throw new IllegalStateException(
          s"$dangling nodes reference a parent id that has no row " +
            "(dangling pointer) — refusing to emit truncated paths")
      // a forest path can never exceed the node count; a longer chain
      // means the doubling is circling a cycle — fail at O(n) array
      // size instead of doubling toward OOM until the iteration cap
      if (counts.getInt(2) > total)
        throw new IllegalStateException(
          "path length exceeded the node count: cycle in the parent graph")
      unresolved = Option(counts.get(0)).fold(0L)(_.asInstanceOf[Long])
      it += 1
    }
    state.select(col("n").as("node"),
      element_at(col("p"), size(col("p"))).as("root"),
      (size(col("p")) - 1).cast("long").as("depth"),
      concat_ws("/",
        transform(reverse(col("p")), x => x.cast("string"))).as("path"))
  }
}
