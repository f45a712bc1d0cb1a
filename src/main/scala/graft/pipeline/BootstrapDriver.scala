package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.ParquetDataset

/** E3 — the pull-based backfill driver (bootstrap_trigger.py:209-258):
  * query the record manifest (file view), dedup to the latest export per
  * record, anti-join against what the Parquet datasets already contain,
  * and emit submission batches of `batchSize` records.
  */
object BootstrapDriver {

  /** A2 — keep the latest row per record id by export time, ties broken
    * deterministically (bootstrap_trigger.py:222-225).
    */
  def keepLatest(
      records: DataFrame, recordId: String, exportedOn: String): DataFrame = {
    val w = Window.partitionBy(col(recordId))
      .orderBy(col(exportedOn).desc, col(recordId).desc)
    records.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** J2/J3 — records NOT present in any of the given Parquet datasets'
    * recordid column (bootstrap_trigger.py:228-250): union of per-dataset
    * anti-join diffs. Each dataset is read column-pruned to recordid.
    */
  def needsProcessing(
      spark: SparkSession,
      records: DataFrame, recordId: String,
      parquetPaths: Seq[String]): DataFrame = {
    if (parquetPaths.isEmpty) return records
    parquetPaths.map { p =>
      val existing = ParquetDataset.read(spark, p, Seq("recordid"))
        .distinct()
      records.join(existing,
        records(recordId) === existing("recordid"), "left_anti")
    }.reduce(_ union _).distinct()
  }

  /** SO4 — deterministic submission batches of `batchSize`
    * (bootstrap_trigger.py:163-181): each record gets a batch number
    * within its routing group.
    */
  def batched(
      records: DataFrame, groupCols: Seq[String], orderCol: String,
      batchSize: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol))
    records
      .withColumn("__rn", row_number().over(w))
      .withColumn("batch_no",
        expr(s"CAST((__rn - 1) div $batchSize AS INT)"))
      .drop("__rn")
  }

  /** A6 — next archive version: max existing update number + 1
    * (archive_dataset.py:119-152), from the archive directory listing.
    */
  def nextArchiveVersion(updateNumbers: DataFrame, numberCol: String): Long =
    updateNumbers.agg(max(col(numberCol).cast("long"))).head() match {
      case r if r.isNullAt(0) => 1L
      case r => r.getLong(0) + 1L
    }
}
