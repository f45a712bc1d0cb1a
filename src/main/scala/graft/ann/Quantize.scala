package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage format most vector
  * stores actually persist: per-vector symmetric scaling
  * (`scale = max|v_i| / 127`, `code_i = round(v_i / scale)`) cuts the
  * embedding footprint 4× against float32 (8× against the float64 the
  * engine computes in), which at 100 TB of corpus embeddings is the
  * difference between the index fitting on the serving tier or not.
  * The error column makes the quality trade MEASURED, not assumed —
  * the same "measure, don't guess" posture as the ANN recall gates.
  *
  * Scale shape: a pure per-row projection (array HOFs, no UDF, no
  * shuffle); codegen keeps it in the scan's stage.
  */
object Quantize {

  /** (id, scale, codes, max_err): symmetric per-vector int8 codes with
    * the reported scale rounded to 9 decimals and the max absolute
    * dequantization error to 6 (oracle-parity quantizers). A zero
    * vector quantizes to all-zero codes with scale 0 and error 0
    * rather than dividing by zero.
    */
  def int8Quantize(emb: DataFrame, id: String, vec: String): DataFrame = {
    val e = transform(col(vec), x => x.cast("double"))
    emb.select(col(id), e.as("__e"))
      .withColumn("__sc",
        array_max(transform(col("__e"), x => abs(x))) / 127.0)
      .select(col(id), round(col("__sc"), 9).as("scale"),
        when(col("__sc") === 0,
          transform(col("__e"), _ => lit(0)))
          .otherwise(transform(col("__e"),
            x => round(x / col("__sc"), 0).cast("int"))).as("codes"),
        when(col("__sc") === 0, lit(0.0))
          .otherwise(round(array_max(transform(col("__e"),
            x => abs(round(x / col("__sc"), 0) * col("__sc") - x))), 6))
          .as("max_err"))
  }

  /** Sign-bit packing: dimension i of `vec` sets bit i%64 of word i/64
    * when the value is STRICTLY positive — 32× smaller than float32,
    * and Hamming distance between two packed vectors is a handful of
    * XOR+popcount word ops instead of a dim-length float loop. Bits
    * assemble with bitwise OR (distinct powers — no ANSI overflow path
    * even for bit 63).
    */
  private def packSignBits(vec: Column): Column =
    // empty/null vectors pack to zero words (the If short-circuits, so
    // the descending sequence + element_at(0) ANSI error path of a
    // 0-length input is never built)
    when(size(vec) > 0,
      transform(
        sequence(lit(0), ((size(vec) - 1) / 64).cast("int")),
        w => aggregate(
          sequence(w * 64,
            least(w * 64 + 63, size(vec) - 1).cast("int")),
          lit(0L),
          (acc, i) => acc.bitwiseOR(
            when(element_at(vec, i + 1) > 0,
              call_function("shiftleft", lit(1L),
                pmod(i, lit(64)).cast("int")))
              .otherwise(lit(0L))))))
      .otherwise(array().cast("array<bigint>"))

  /** Two-stage binary-quantized top-k: Hamming distance over packed
    * sign bits prunes the corpus to `rerank` candidates per query
    * (ties → lower id), then exact cosine re-ranks only those — the
    * standard serving-tier recipe (binary pre-filter + float rerank)
    * that touches dim/64 longs per corpus row instead of dim floats,
    * an 8-16× cut in the distance stage's bytes and ALU work.
    *
    * Output per query: (q_id, rank, neighbor_id, hamming, sim) with
    * rank by (cosine desc, id), sim rounded 4 ([[Ann.topK]]
    * convention). Queries broadcast packed; the corpus packs once in
    * the scan projection and never shuffles — the per-query rank
    * windows run over |corpus| candidate rows pre-pruned to `rerank`
    * before any float math.
    */
  def binaryHammingTopK(
      corpus: DataFrame, id: String, vec: String,
      queries: DataFrame, qId: String, qVec: String,
      k: Int, rerank: Int): DataFrame = {
    require(k > 0 && rerank >= k, "need k > 0 and rerank >= k")
    val corp = corpus.select(col(id), col(vec).as("__v"),
      packSignBits(col(vec)).as("__cw"))
    val qs = queries.select(col(qId).as("q_id"), col(qVec).as("__qv"),
      packSignBits(col(qVec)).as("__qw"))
    // zip_with pads a shorter word array with nulls; an absent word
    // reads as 0 bits, so a degenerate (empty/short) vector measures
    // the full popcount of the other side instead of a null distance.
    // Sessions with GraftExtensions get the native codegen'd
    // Long.bitCount loop ([[graft.functions.HammingDistance]], zero
    // allocation on the |corpus|·|queries| hot path); plain sessions
    // transparently fall back to the HOF form — same values
    // (HammingDistanceSpec pins the parity).
    val ham = org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) if s.catalog.functionExists(
          graft.functions.HammingDistance.Name) =>
        graft.functions.HammingDistance.hammingNative(
          col("__qw"), col("__cw"))
      case _ => aggregate(
        zip_with(col("__qw"), col("__cw"),
          (a, b) => bit_count(coalesce(a, lit(0L))
            .bitwiseXOR(coalesce(b, lit(0L))))),
        lit(0), (acc, x) => acc + x)
    }
    val scored = corp.crossJoin(broadcast(qs))
      .where(col("q_id") =!= col(id))
      .withColumn("hamming", ham.cast("long"))
    val wH = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming").asc, col(id).asc)
    val cand = scored.withColumn("__crk", row_number().over(wH))
      .where(col("__crk") <= rerank)
    // exact cosine only on the surviving candidates
    val dot = aggregate(
      zip_with(col("__qv"), col("__v"),
        (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val norm = (c: Column) => sqrt(aggregate(
      transform(c, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    val wC = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col(id).asc)
    // a zero-norm survivor has no defined cosine: null (ranked last —
    // desc puts nulls last), never ANSI DIVIDE_BY_ZERO
    val den = norm(col("__qv")) * norm(col("__v"))
    cand
      .withColumn("sim",
        when(den === 0, lit(null).cast("double"))
          .otherwise(round(dot / den, 4)))
      .withColumn("rank", row_number().over(wC))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("int").as("rank"),
        col(id).as("neighbor_id"), col("hamming"), col("sim"))
  }

  /** Per-vector int8 codes as a Column ([[int8Quantize]]'s quantizer,
    * factored so the top-k scan can quantize in the scan projection
    * without materializing the codes table).
    */
  private def int8Codes(vec: Column): Column = {
    val e = transform(vec, x => x.cast("double"))
    val sc = array_max(transform(e, x => abs(x))) / 127.0
    when(sc === 0, transform(e, _ => lit(0)))
      .otherwise(transform(e, x => round(x / sc, 0).cast("int")))
  }

  /** Two-stage int8-quantized top-k — the QUERY path for the 4×-smaller
    * format [[int8Quantize]] persists: stage 1 ranks the corpus by
    * cosine over the int8 codes (a pure integer multiply-accumulate —
    * the per-vector scales cancel out of the cosine ratio, so the
    * approximate score needs no float rescale at all) and keeps
    * `rerank` candidates per query (ties → lower id); stage 2 re-ranks
    * only the survivors by exact float cosine. Same serving-tier
    * recipe as [[binaryHammingTopK]], trading the binary path's 8-16×
    * byte cut for a far tighter pre-rank (int8 cosine is within
    * ~1/127 of exact, so small rerank budgets already reach full
    * recall — QuantizeSpec pins exact parity at rerank = |corpus|).
    *
    * Output per query: (q_id, rank, neighbor_id, qsim, sim) — qsim the
    * int8-cosine prune score, both rounded to 4 ([[Ann.topK]]
    * convention) BEFORE their rank windows so candidate cuts are
    * engine-reproducible. Queries broadcast quantized; the corpus
    * quantizes once in the scan projection and never shuffles.
    */
  def int8TopK(
      corpus: DataFrame, id: String, vec: String,
      queries: DataFrame, qId: String, qVec: String,
      k: Int, rerank: Int): DataFrame = {
    require(k > 0 && rerank >= k, "need k > 0 and rerank >= k")
    val corp = corpus.select(col(id), col(vec).as("__v"),
      int8Codes(col(vec)).as("__cc"))
    val qs = queries.select(col(qId).as("q_id"), col(qVec).as("__qv"),
      int8Codes(col(qVec)).as("__qc"))
    // integer MAC: products peak at 127² and dims are bounded, but the
    // accumulator goes long anyway — ANSI mode must never see an
    // overflow path
    val idot = aggregate(
      zip_with(col("__qc"), col("__cc"), (a, b) => (a * b).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val inorm = (c: Column) => sqrt(aggregate(
      transform(c, x => (x * x).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double"))
    val den = inorm(col("__qc")) * inorm(col("__cc"))
    val scored = corp.crossJoin(broadcast(qs))
      .where(col("q_id") =!= col(id))
      .withColumn("qsim", round(
        when(den === 0, lit(0.0)).otherwise(idot.cast("double") / den), 4))
    val wQ = Window.partitionBy(col("q_id"))
      .orderBy(col("qsim").desc, col(id).asc)
    val cand = scored.withColumn("__crk", row_number().over(wQ))
      .where(col("__crk") <= rerank)
    val dot = aggregate(
      zip_with(col("__qv"), col("__v"),
        (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val norm = (c: Column) => sqrt(aggregate(
      transform(c, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    val wC = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col(id).asc)
    // zero-norm survivor: null cosine (ranked last), never ANSI
    // DIVIDE_BY_ZERO
    val den2 = norm(col("__qv")) * norm(col("__v"))
    cand
      .withColumn("sim",
        when(den2 === 0, lit(null).cast("double"))
          .otherwise(round(dot / den2, 4)))
      .withColumn("rank", row_number().over(wC))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("int").as("rank"),
        col(id).as("neighbor_id"), col("qsim"), col("sim"))
  }
}
