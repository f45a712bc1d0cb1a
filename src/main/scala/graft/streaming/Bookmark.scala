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
    */
  def commit(spark: SparkSession, dataPath: String, manifestPath: String): Unit =
    FileListing.list(spark, dataPath)
      .where(col("path").endsWith(".parquet"))
      .select(normalize(col("path")).as("path"))
      .write.mode("overwrite").parquet(manifestPath)

  /** Scan `dataPath`, keeping only rows from files NOT in the manifest.
    * With no manifest yet, everything is new (first run).
    */
  def newData(spark: SparkSession, dataPath: String, manifestPath: String): DataFrame = {
    val df = spark.read.parquet(dataPath)
      .withColumn("__file", normalize(input_file_name()))
    val manifestExists = {
      val p = new org.apache.hadoop.fs.Path(manifestPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val out =
      if (!manifestExists) df
      else df.join(
        broadcast(spark.read.parquet(manifestPath)),
        df("__file") === col("path"), "left_anti")
    out.drop("__file")
  }
}
