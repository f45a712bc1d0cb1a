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
    * listings to a comparable plain path. Shared by every consumer that
    * compares listings to manifests — a second normalizer that drifts
    * from this one silently desynchronizes new-file detection.
    */
  private[graft] def normalize(c: Column): Column =
    regexp_replace(c, "^[a-zA-Z0-9+.-]+:/+", "/")

  /** Normalized listing of `dataPath`'s DATA files (Glue-style hidden
    * files — leading `_`/`.` — are never data), as a (path) DataFrame.
    */
  def listDataFiles(spark: SparkSession, dataPath: String): DataFrame =
    FileListing.list(spark, dataPath)
      .where(!col("path").rlike("/[_.][^/]*$"))
      .select(normalize(col("path")).as("path"))

  def manifestExists(spark: SparkSession, manifestPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(manifestPath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Normalized paths of data files not yet in the manifest — the
    * driver-sized file delta (one row per FILE; see the class doc's
    * budget argument). Sorted for deterministic downstream use.
    */
  def newFiles(
      spark: SparkSession, dataPath: String, manifestPath: String): Seq[String] = {
    val listed = listDataFiles(spark, dataPath)
    val fresh =
      if (!manifestExists(spark, manifestPath)) listed
      else listed.join(
        broadcast(spark.read.parquet(manifestPath)), Seq("path"), "left_anti")
    fresh.collect().map(_.getString(0)).sorted.toSeq
  }

  /** Record the current file set of `dataPath` as processed. Overwrites —
    * the manifest is always the full listing, which makes commit
    * idempotent and crash-safe (a re-run after failure re-lists).
    */
  def commit(spark: SparkSession, dataPath: String, manifestPath: String): Unit =
    listDataFiles(spark, dataPath)
      .write.mode("overwrite").parquet(manifestPath)

  /** Record exactly `paths` (plus everything already committed) as
    * processed — the commit for a PINNED batch: a full-listing commit
    * after a pinned run would mark files that landed mid-run as
    * processed without them ever being converted. The manifest is
    * driver-sized by the budget argument above, so the union runs on
    * the driver (reading and overwriting the same parquet path in one
    * lazy plan would race the overwrite with the scan).
    */
  def commitFiles(
      spark: SparkSession, manifestPath: String, paths: Seq[String]): Unit = {
    import spark.implicits._
    val prev =
      if (!manifestExists(spark, manifestPath)) Nil
      else spark.read.parquet(manifestPath)
        .select("path").as[String].collect().toSeq
    (prev ++ paths).distinct.toDF("path")
      .write.mode("overwrite").parquet(manifestPath)
  }

  /** Keep only rows of `df` coming from files of `dataPath` NOT yet in
    * the manifest. With no manifest yet, everything is new (first run).
    * Works for any file-based source (`df` must originate from a scan so
    * input_file_name() is populated).
    *
    * @param pinnedFiles when the caller already holds the new-file list
    *   (e.g. [[newFiles]] computed for schema inference), pass it to pin
    *   the exact set — no re-listing, and no window for a file landing
    *   between two listings to slip through unexamined
    */
  def newDataFrom(
      spark: SparkSession, df: DataFrame,
      dataPath: String, manifestPath: String,
      pinnedFiles: Option[Seq[String]] = None): DataFrame = {
    import spark.implicits._
    val withFile = df.withColumn("__file", normalize(input_file_name()))
    val out = pinnedFiles match {
      case Some(paths) =>
        withFile.join(
          broadcast(paths.toDF("path")),
          withFile("__file") === col("path"), "left_semi")
      case None if !manifestExists(spark, manifestPath) => withFile
      case None =>
        withFile.join(
          broadcast(spark.read.parquet(manifestPath)),
          withFile("__file") === col("path"), "left_anti")
    }
    out.drop("__file")
  }

  /** Parquet-dataset convenience wrapper over newDataFrom. */
  def newData(spark: SparkSession, dataPath: String, manifestPath: String): DataFrame =
    newDataFrom(spark, spark.read.parquet(dataPath), dataPath, manifestPath)
}
