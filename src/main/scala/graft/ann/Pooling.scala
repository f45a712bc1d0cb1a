package graft.ann

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Embedding pooling — the chunk→document aggregation every long-context
  * retrieval pipeline runs: documents are embedded chunk-by-chunk (the
  * encoder's context window is finite) and retrieval wants ONE vector
  * per document, conventionally the elementwise mean.
  *
  * Scale shape: a typed [[Aggregator]] sums fixed-width double arrays
  * in place — one hash aggregate with map-side combine whose state is
  * dim + 1 doubles per group. The obvious alternative (posexplode to
  * (id, pos, value) rows and groupBy (id, pos)) multiplies the shuffle
  * by the dimension (64–4096×); the aggregator ships one array per
  * group per map task instead.
  */
object Pooling {

  /** Sum + count buffer: buf(0) = n, buf(1..dim) = running sums. The
    * first row seen sizes the buffer; dimension mismatches fail loudly
    * (a ragged embedding column is corrupt input, not poolable).
    */
  private final class MeanVec
      extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    def zero: Array[Double] = Array.empty
    def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] = {
      if (v == null) return buf
      val b = if (buf.length == 0) new Array[Double](v.length + 1) else buf
      require(b.length == v.length + 1,
        s"ragged embedding: dim ${v.length} vs ${b.length - 1}")
      b(0) += 1.0
      var i = 0
      while (i < v.length) { b(i + 1) += v(i); i += 1 }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      if (a.length == 0) return b
      if (b.length == 0) return a
      require(a.length == b.length,
        s"ragged embedding: dims ${a.length - 1} vs ${b.length - 1}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(buf: Array[Double]): Seq[Double] =
      if (buf.length == 0) Seq.empty
      else {
        val n = buf(0)
        Array.tabulate(buf.length - 1)(i =>
          math.floor(buf(i + 1) / n * 1e6 + 0.5) / 1e6).toSeq
      }
    def bufferEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** (group, pooled, n_chunks): elementwise mean of `vec` per `group`
    * (output keeps the caller's group column name), each element
    * quantized by `floor(x·10⁶ + 0.5)/10⁶` — the repo's oracle-parity
    * quantizer, sign-stable because both engines apply the identical
    * formula; floating-point mean order differs across partitionings,
    * so an unquantized contract would not even be self-consistent.
    */
  def meanPool(chunks: DataFrame, group: String, vec: String): DataFrame = {
    val mv = udaf(new MeanVec)
    chunks
      .select(col(group), col(vec).cast("array<double>").as("__v"))
      .groupBy(col(group))
      .agg(mv(col("__v")).as("pooled"), count(col("__v")).as("n_chunks"))
  }
}
