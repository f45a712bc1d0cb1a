package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.FileListing

/** §2.8 — Glue-job-bookmark equivalent: a processed-file manifest plus a
  * `left_anti` join on `input_file_name()`, so each run processes only
  * files that appeared since the last commit
  * (templates/study-pipeline-infra.j2:125 enables bookmarks per job;
  * docs/schema_change_protocol.md:31-33 documents the reset procedure —
  * here a reset is just deleting the manifest).
  *
  * Scale design: the manifest holds one row per data FILE (not per
  * record), so even a petabyte dataset yields a manifest of at most a few
  * million short strings — always broadcastable; the anti-join therefore
  * never shuffles the data being scanned.
  */
object Bookmark {

  /** Normalize `file:`-style URIs from input_file_name() and Hadoop
    * listings to a comparable plain path.
    */
  private def normalize(c: Column): Column =
    regexp_replace(c, "^[a-zA-Z0-9+.-]+:/+", "/")

  /** Record the current file set of `dataPath` as processed. Overwrites —
    * the manifest is always the full listing, which makes commit
    * idempotent and crash-safe (a re-run after failure re-lists).
    * Glue-style hidden files (leading `_`/`.`) are never data.
    */
  def commit(spark: SparkSession, dataPath: String, manifestPath: String): Unit =
    FileListing.list(spark, dataPath)
      .where(!col("path").rlike("/[_.][^/]*$"))
      .select(normalize(col("path")).as("path"))
      .write.mode("overwrite").parquet(manifestPath)

  /** Keep only rows of `df` coming from files of `dataPath` NOT yet in
    * the manifest. With no manifest yet, everything is new (first run).
    * Works for any file-based source (`df` must originate from a scan so
    * input_file_name() is populated).
    */
  def newDataFrom(
      spark: SparkSession, df: DataFrame,
      dataPath: String, manifestPath: String): DataFrame = {
    val withFile = df.withColumn("__file", normalize(input_file_name()))
    val manifestExists = {
      val p = new org.apache.hadoop.fs.Path(manifestPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val out =
      if (!manifestExists) withFile
      else withFile.join(
        broadcast(spark.read.parquet(manifestPath)),
        withFile("__file") === col("path"), "left_anti")
    out.drop("__file")
  }

  /** Parquet-dataset convenience wrapper over newDataFrom. */
  def newData(spark: SparkSession, dataPath: String, manifestPath: String): DataFrame =
    newDataFrom(spark, spark.read.parquet(dataPath), dataPath, manifestPath)
}
