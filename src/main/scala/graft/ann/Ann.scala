package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Tiers:
  *  - topK:       brute-force cosine top-k — the exactness baseline; the
  *                query set is broadcast so the corpus streams through one
  *                narrow pass (no corpus shuffle, no corpus×corpus product)
  *  - ivfTopK:    IVF-style coarse quantization — the scale path: probe
  *                the nprobe nearest centroids, score only those clusters'
  *                vectors (cost drops by ~nclusters/nprobe)
  *  - signLshPairs: random-hyperplane sign sketches for high-threshold
  *                near-dup pairs without an all-pairs product
  *  - bruteForcePairs: exact pair similarity (verification baseline)
  *
  * All arithmetic is cast to double before accumulation so results are
  * reproducible across engines (float fold order differs otherwise).
  */
object Ann {

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Compute-bound stages need at least one partition per core — a single
    * small parquet file otherwise pins the whole similarity computation to
    * one task. No-op on already-wide inputs.
    */
  private def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Dot product of two numeric array columns (double math) — a native
    * codegen'd expression (graft.functions.DotProduct): identical
    * left-to-right accumulation to the zip_with/aggregate form, minus the
    * interpreted per-element lambdas.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotNative(toDouble(a), toDouble(b))

  /** L2 norm of a numeric array column. */
  def l2norm(a: Column): Column = {
    val ad = toDouble(a)
    sqrt(graft.functions.DotProduct.dotNative(ad, ad))
  }

  /** Cosine similarity of two numeric array columns (double math). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k: each query row against the whole corpus.
    * Queries are broadcast; similarity is rounded to 4 decimals before
    * ranking (ties broken by neighbor id) for cross-engine determinism.
    */
  def topK(
      corpus: DataFrame, id: String, vec: String,
      queries: DataFrame, qId: String, qVec: String,
      k: Int): DataFrame = {
    // norms precomputed once per row, not once per pair — the higher-order
    // aggregate lambdas are interpreted, so this cuts the per-pair work to
    // a single dot product (numerically identical: same dot / (na * nb))
    val scored = widen(corpus).withColumn("__n", l2norm(col(vec)))
      .crossJoin(broadcast(
        queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
          .withColumn("__qn", l2norm(col("q_vec")))))
      .where(col("q_id") =!= col(id))
      .withColumn("sim",
        round(dot(col("q_vec"), col(vec)) / (col("__qn") * col("__n")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col(id).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("int").as("rank"),
        col(id).as("neighbor_id"), col("sim"))
  }

  /** Elementwise centroid per cluster column (posexplode + avg + rebuild —
    * a two-shuffle aggregation over (cluster, dim)).
    */
  def centroids(corpus: DataFrame, cluster: String, vec: String): DataFrame =
    corpus
      .select(col(cluster), posexplode(toDouble(col(vec))).as(Seq("pos", "x")))
      .groupBy(col(cluster), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col(cluster))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col(cluster), transform(col("pm"), p => p.getField("m")).as("centroid"))

  /** IVF-style approximate top-k: score each query against the (tiny,
    * broadcast) centroid table, keep the `nprobe` nearest clusters, then
    * score only vectors in those clusters. Recall < 1 by construction;
    * the scan cost drops by roughly nclusters/nprobe.
    */
  def ivfTopK(
      corpus: DataFrame, id: String, vec: String, cluster: String,
      queries: DataFrame, qId: String, qVec: String,
      k: Int, nprobe: Int): DataFrame = {
    val cents = centroids(corpus, cluster, vec)
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col(cluster).asc)
    val probed = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("q_vec"), col("centroid")))
      .withColumn("crank", row_number().over(probeW))
      .where(col("crank") <= nprobe)
      .select(col("q_id"), col("q_vec"), col(cluster))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col(id).asc)
    widen(corpus).withColumn("__n", l2norm(col(vec)))
      .join(broadcast(probed.withColumn("__qn", l2norm(col("q_vec")))),
        Seq(cluster))
      .where(col("q_id") =!= col(id))
      .withColumn("sim",
        round(dot(col("q_vec"), col(vec)) / (col("__qn") * col("__n")), 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("int").as("rank"),
        col(id).as("neighbor_id"), col("sim"))
  }

  /** Exact pairwise similarity ≥ threshold (verification baseline —
    * quadratic; use signLshPairs at scale for high thresholds).
    */
  def bruteForcePairs(
      corpus: DataFrame, id: String, vec: String,
      threshold: Double): DataFrame = {
    val a = widen(corpus).select(col(id).as("id1"), col(vec).as("v1"),
      l2norm(col(vec)).as("n1"))
    val b = corpus.select(col(id).as("id2"), col(vec).as("v2"),
      l2norm(col(vec)).as("n2"))
    a.crossJoin(broadcast(b)).where(col("id1") < col("id2"))
      .withColumn("sim",
        round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 4))
      .where(col("sim") >= threshold)
      .select(col("id1"), col("id2"), col("sim"))
  }

  /** Deterministic Rademacher hyperplanes: component (j, d) is ±1 from a
    * seeded hash — reproducible across runs with no RNG state.
    */
  private def planeComponent(j: Int, d: Int): Double = {
    var h = j * 1000003L + d * 37L + 0x9e3779b97f4a7c15L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  /** Sign-sketch signature: bit j = sign(v · plane_j), emitted as a
    * '0'/'1' string of length `bits`.
    */
  def signature(vec: Column, bits: Int, dim: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      val plane = array((0 until dim).map(d => lit(planeComponent(j, d))): _*)
      when(aggregate(zip_with(toDouble(vec), plane, (x, p) => x * p),
        lit(0.0), (acc, v) => acc + v) > 0, "1").otherwise("0")
    }
    concat(bitCols: _*)
  }

  /** High-threshold near-dup pairs via sign-LSH bucketing: vectors
    * agreeing on a full band of sketch bits join within the bucket only,
    * then exact cosine verification removes false positives. For cosine
    * ≥ τ the per-bit agreement is 1 − arccos(τ)/π, so band length trades
    * recall against bucket size.
    */
  def signLshPairs(
      corpus: DataFrame, id: String, vec: String,
      threshold: Double, bits: Int = 16, bands: Int = 8, dim: Int = 64): DataFrame = {
    require(bits % bands == 0)
    val rows = bits / bands
    val sig = widen(corpus).select(col(id).as("id"), col(vec).as("v"),
      signature(col(vec), bits, dim).as("sig"))
    val banded = sig.select(col("id"), col("v"),
        posexplode(array((0 until bands).map(b =>
          concat(lit(b.toString), lit(":"),
            substring(col("sig"), b * rows + 1, rows))): _*))
          .as(Seq("band", "bucket")))
      .select(col("id"), col("v"), col("bucket"))
    banded.as("x").join(banded.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"),
        col("x.v").as("v1"), col("y.v").as("v2"))
      .distinct()
      .withColumn("sim", round(cosine(col("v1"), col("v2")), 4))
      .where(col("sim") >= threshold)
      .select(col("id1"), col("id2"), col("sim"))
  }
}
