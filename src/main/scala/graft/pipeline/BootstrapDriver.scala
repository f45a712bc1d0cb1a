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

  /** [[nextArchiveVersion]] from the archive directory itself: parse the
    * update number out of existing `{datasetName}_{n}` children, exactly
    * the reference's prefix-listing derivation
    * (archive_dataset.py:119-152 — `prefix.split("_")[-1]`, max, +1;
    * 0 existing archives → 1).
    */
  def nextArchiveVersion(
      spark: SparkSession, archiveRoot: String, datasetName: String): Long = {
    val root = new org.apache.hadoop.fs.Path(archiveRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pat = java.util.regex.Pattern.quote(datasetName) + "_(\\d+)"
    val nums =
      if (!fs.exists(root)) Array.empty[Long]
      else fs.listStatus(root).collect {
        case st if st.isDirectory =>
          val m = pat.r.unapplySeq(st.getPath.getName)
          m.flatMap(_.headOption).map(_.toLong)
      }.flatten
    if (nums.isEmpty) 1L else nums.max + 1L
  }

  /** The archival operation itself (archive_dataset.py:155-170's
    * `aws s3 cp --recursive`, Spark-shaped): snapshot-copy a parquet
    * dataset directory into `archive/{datasetName}_{n}` at the next
    * update number, then verify row-count parity between source and
    * archive before reporting success. The file copies are DISTRIBUTED —
    * one task per batch of files, each streaming through the executors'
    * FS clients — so archive bandwidth scales with the cluster, not the
    * driver (the reference shells out to a single recursive CLI copy;
    * at 100 TB that is the difference between minutes and days). The
    * file LIST rides the driver like every other listing here — one row
    * per file, metadata-sized.
    *
    * The archive is a frozen copy: later appends to the source never
    * touch it (spec-pinned).
    *
    * @return (archive path, archived row count)
    */
  def archiveDataset(
      spark: SparkSession, datasetPath: String, archiveRoot: String,
      datasetName: String): (String, Long) = {
    import spark.implicits._
    val version = nextArchiveVersion(spark, archiveRoot, datasetName)
    val destRoot = s"$archiveRoot/${datasetName}_$version"
    val srcRoot = new org.apache.hadoop.fs.Path(datasetPath)
    val srcFs = srcRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcPrefix = srcFs.makeQualified(srcRoot).toString
    val files = graft.ingest.FileListing.list(spark, datasetPath)
      .select("path").as[String]
    val serConf = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val nCopied = files.repartition(files.sparkSession.sparkContext
        .defaultParallelism).mapPartitions { paths =>
      val conf = serConf.value
      var n = 0L
      paths.foreach { p =>
        val src = new org.apache.hadoop.fs.Path(p)
        val fs = src.getFileSystem(conf)
        val qualified = fs.makeQualified(src).toString
        require(qualified.startsWith(srcPrefix),
          s"listed file $qualified escapes the dataset root $srcPrefix")
        val rel = qualified.stripPrefix(srcPrefix).stripPrefix("/")
        val dst = new org.apache.hadoop.fs.Path(s"$destRoot/$rel")
        val dstFs = dst.getFileSystem(conf)
        org.apache.hadoop.fs.FileUtil.copy(
          fs, src, dstFs, dst, false, true, conf)
        n += 1
      }
      Iterator.single(n)
    }.reduce(_ + _)
    val srcCount = spark.read.parquet(datasetPath).count()
    val dstCount = spark.read.parquet(destRoot).count()
    require(srcCount == dstCount,
      s"archive parity check failed: source $datasetPath has $srcCount " +
        s"rows but archive $destRoot has $dstCount (copied $nCopied files)")
    (destRoot, dstCount)
  }
}
