package graft.ann

import org.apache.spark.sql.DataFrame
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
}
