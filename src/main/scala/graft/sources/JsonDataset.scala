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
