package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Partitioned-NDJSON "JSON dataset" source/sink (S2/S3) with
  * partition-column injection (P3/V5).
  *
  * Layout contract (s3_to_json_s3.py:620-647):
  * `{root}/dataset={id}/assessmentid={a}/year={y}/month={m}/day={d}/...`
  * — Hive-style directories, NDJSON files, partition values derived from
  * the record's `uploadedon` S3-metadata timestamp
  * (`%Y-%m-%dT%H:%M:%S.%fZ`, s3_to_json_s3.py:592-594).
  *
  * The reference injects fields dict-by-dict per record; the Spark-native
  * shape is column-wise over a DataFrame of records, which distributes and
  * lets the partitioned writer place every row without a per-file driver
  * loop.
  */
object JsonDataset {

  val PartitionCols: Seq[String] = Seq("assessmentid", "year", "month", "day")

  /** The reference's uploadedon format (s3_to_json_s3.py:592). */
  val UploadedOnFormat = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

  /** P3 + V5 — inject the partition fields (assessmentid, year, month,
    * day — ints, per the reference's data columns) and recordid into every
    * row, deriving year/month/day from an ISO-8601 `uploadedon` string
    * column (s3_to_json_s3.py:592-619).
    */
  def injectPartitions(
      df: DataFrame,
      uploadedOn: Column,
      assessmentId: Column,
      recordId: Column): DataFrame = {
    val up = to_timestamp(uploadedOn, UploadedOnFormat)
    df.withColumn("assessmentid", assessmentId)
      .withColumn("year", year(up))
      .withColumn("month", month(up))
      .withColumn("day", dayofmonth(up))
      .withColumn("recordid", recordId)
  }

  /** ArchiveMetadata variant: every metadata field is injected, not just
    * the partition fields (s3_to_json_s3.py:598-604). Metadata arrives as
    * a map column of the S3 object metadata.
    */
  def injectAllMetadata(df: DataFrame, metadata: Map[String, Column]): DataFrame =
    metadata.foldLeft(df) { case (d, (k, v)) => d.withColumn(k, v) }

  /** S3 — partitioned-NDJSON sink. Clustered by the partition columns
    * first so each partition directory receives one file per run instead
    * of one per task (see ParquetDataset.write).
    */
  def write(df: DataFrame, root: String, dataset: String): Unit =
    df.repartition(PartitionCols.map(df.col): _*)
      .write
      .mode("append")
      .partitionBy(PartitionCols: _*)
      .json(s"$root/dataset=$dataset")

  /** Reference file-naming contract (s3_to_json_s3.py:620-623): one
    * `{recordid}.ndjson` per record, and names starting with `_` or `.`
    * get a `0` prefix so downstream scanners (which treat such files as
    * hidden) don't silently drop the record.
    */
  private[graft] def recordFileName(recordId: String): String = {
    val f = recordId + ".ndjson"
    if (f.startsWith("_") || f.startsWith(".")) "0" + f else f
  }

  /** Opt-in PER-RECORD sink: exactly one `{recordid}.ndjson` file per
    * record under the Hive partition directories — file-level interop
    * with the reference layout (s3_to_json_s3.py:620-647), where a
    * consumer addresses records by file name. [[write]] (task-numbered
    * part files) remains the default: per-record files are the right
    * shape only when records are few or a downstream contract demands
    * the names — at 100 TB a file per record is a small-files
    * anti-pattern.
    *
    * Distributed: rows are hash-partitioned by recordid and sorted
    * within partitions by the full routing key, so each task streams
    * record-contiguous runs and holds ONE open file at a time (a record
    * whose rows span several partition-value combinations gets one file
    * per combination, same as the reference's per-archive write).
    * Multi-row records (the reference's JSON-array case,
    * s3_to_json_s3.py:607-614) concatenate newline-delimited into their
    * one file. Files are created with overwrite, so re-runs are
    * idempotent (the reference's put_object semantics).
    *
    * @return number of files written
    */
  def writePerRecord(df: DataFrame, root: String, dataset: String): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    val needed = "recordid" +: PartitionCols
    require(needed.forall(df.columns.contains),
      s"writePerRecord needs columns ${needed.mkString(", ")}; " +
        s"got ${df.columns.mkString(", ")}")
    val payload = to_json(struct(df.columns.map(col).toSeq: _*))
    val routed = df.select(
        col("recordid").cast("string"),
        col("assessmentid").cast("string"),
        col("year").cast("string"),
        col("month").cast("string"),
        col("day").cast("string"),
        payload.as("__json"))
      .as[(String, String, String, String, String, String)]
      .repartition(col("recordid"))
      .sortWithinPartitions("recordid", "assessmentid", "year", "month", "day")
    val serConf = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val base = s"$root/dataset=$dataset"
    routed.mapPartitions { rows =>
      val conf = serConf.value
      var current: String = null
      var out: java.io.Writer = null
      var n = 0L
      def close(): Unit = if (out != null) { out.close(); out = null }
      try {
        rows.foreach { case (rid, aid, y, m, d, js) =>
          val path =
            s"$base/assessmentid=$aid/year=$y/month=$m/day=$d/" +
              recordFileName(rid)
          if (path != current) {
            close()
            val p = new org.apache.hadoop.fs.Path(path)
            out = new java.io.OutputStreamWriter(
              p.getFileSystem(conf).create(p, true),
              java.nio.charset.StandardCharsets.UTF_8)
            current = path
            n += 1
          }
          out.write(js)
          out.write('\n')
        }
      } finally close()
      Iterator.single(n)
    }.reduce(_ + _)
  }

  /** S2 — schema-applied NDJSON scan of a JSON dataset (the catalog +
    * resolveChoice(match_catalog) equivalent): partition columns come back
    * from the directory layout, data columns from the declared schema.
    */
  def read(spark: SparkSession, root: String, dataset: String, schema: StructType): DataFrame =
    spark.read
      .option("basePath", s"$root/dataset=$dataset")
      .schema(schema)
      .json(s"$root/dataset=$dataset")
}
