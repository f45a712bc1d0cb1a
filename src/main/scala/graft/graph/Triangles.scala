package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected graph — the local
  * clustering signal web-corpus curation reads off its link graph
  * (genuine communities close triangles; link farms and generated spam
  * graphs are triangle-sparse for their density, and a node's triangle
  * count against its degree is the classic coefficient). Input edges
  * may be directed/duplicated/self-looped; they canonicalize first.
  *
  * Scale shape: the DEGREE-ORDERED orientation (node-iterator of
  * Schank/Wagner; the MapReduce form is Suri & Vassilvitskii's
  * MR-NodeIterator++). Every edge orients from its lower (degree, id)
  * endpoint to the higher; wedges enumerate only between the OUT-edges
  * of each node, so a degree-d hub that would generate d²/2 wedges as
  * a center generates none — every wedge it joins is centered at one
  * of its lower-degree neighbors. Out-degrees are bounded by O(√|E|)
  * on any graph (arboricity bound), which turns the wedge stage from
  * Σ deg² (hub-quadratic) into Σ outdeg² ≤ O(|E|^1.5) worst-case and
  * near-linear on real skewed graphs. Three shuffles total: the degree
  * aggregate, the wedge self-join keyed on the center, and the closing
  * equi-join against the canonical edge set; per-node counts are one
  * explode + hash aggregate over the triangle rows, and zero-triangle
  * nodes are kept via a left join from the node set (every node
  * reports, the RetrievalEval contract).
  */
object Triangles {

  /** One row per node: (node, n_triangles). Each triangle {a,b,c}
    * contributes 1 to all three nodes; the global count is
    * sum(n_triangles)/3.
    */
  def perNode(edges: DataFrame, src: String, dst: String): DataFrame = {
    val und = edges
      .select(least(col(src), col(dst)).as("u"),
        greatest(col(src), col(dst)).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull &&
        col("v").isNotNull)
      .distinct()
      .localCheckpoint() // reused: degrees, orientation, closing join
    val deg = und.select(col("u").as("n"))
      .unionAll(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient low (degree, id) -> high: a struct compare does the
    // lexicographic (d, node) total order in one expression
    val ord = und
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"),
        "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"),
        "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("u")).otherwise(col("v")).as("lo"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("v")).otherwise(col("u")).as("hi"))
    // a.hi < b.hi pairs each out-neighbor pair once AND hands the
    // closing probe its canonical (u < v) key directly
    val wedges = ord.as("a").join(ord.as("b"),
        col("a.lo") === col("b.lo") && col("a.hi") < col("b.hi"))
      .select(col("a.lo").as("x"), col("a.hi").as("u"),
        col("b.hi").as("v"))
    val tris = wedges.join(und, Seq("u", "v"))
      .select(col("x"), col("u"), col("v"))
    val perNode = tris
      .select(explode(array(col("x"), col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.select(col("n").as("node"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
