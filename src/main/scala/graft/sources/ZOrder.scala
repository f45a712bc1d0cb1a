package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the storage-side answer to
  * multi-dimensional scan pruning: parquet row-group and file pruning
  * work off per-file min/max stats, which only help when values are
  * CLUSTERED. Sorting by one column prunes that column alone; sorting
  * by the bit-interleaved Morton code clusters BOTH dimensions at once,
  * so a 2-D box predicate touches a handful of files instead of all of
  * them. At 100 TB this is the difference between a point lookup
  * reading gigabytes and reading terabytes; the write is one
  * range-repartition + local sort, no extra shuffle beyond the
  * repartition any clustered write needs.
  *
  * The interleave is a pure column expression (16 bits per dimension,
  * fold of shift/mask/or — whole-stage codegen, no UDF), so a SQL
  * oracle re-derives every code with the same integer arithmetic.
  */
object ZOrder {

  /** Bits taken from each dimension (values must fit: 0 ≤ v < 2^16). */
  val BitsPerDim = 16

  /** Morton interleave of two non-negative ints: bit b of `x` lands at
    * z-bit 2b, bit b of `y` at 2b+1. Larger values than 16 bits must be
    * range-bucketed by the caller first (the usual recipe: rank or
    * quantile-bucket each dimension into 2^16 cells, then interleave).
    */
  def morton2(x: Column, y: Column): Column =
    (0 until BitsPerDim).map { b =>
      shiftleft(shiftrightunsigned(x.cast("long"), b).bitwiseAND(lit(1L)),
        2 * b).bitwiseOR(
        shiftleft(shiftrightunsigned(y.cast("long"), b).bitwiseAND(lit(1L)),
          2 * b + 1))
    }.reduce(_.bitwiseOR(_))

  /** Write `df` parquet at `path` clustered by the Morton code of
    * (`xCol`, `yCol`) across `numFiles` files: range-repartition on the
    * code (so file k holds a contiguous z-range) + sort within each
    * file (so row groups are contiguous sub-ranges too). The helper
    * column never lands in the files.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("__z", morton2(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
