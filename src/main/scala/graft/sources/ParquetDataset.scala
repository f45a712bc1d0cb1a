package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned-Parquet dataset sink/scan (S4/S5) — the pipeline's final
  * output artifact (json_s3_to_parquet.py:81-103): Hive-partitioned by
  * `assessmentid/year/month/day`, append-mode so incremental runs add new
  * partitions without rewriting history. Partition pruning and column
  * pruning on the read side are Catalyst built-ins; callers `select` what
  * they need (bootstrap_trigger.py:121-144 reads just `recordid`).
  */
object ParquetDataset {

  /** Rows are clustered by the partition columns before the write:
    * without it every task opens a writer in every partition directory it
    * touches (tasks × partitions small files — the classic partitioned-
    * write explosion); with it each partition value lands in one task and
    * produces one well-sized file. Hot partition values that overflow a
    * single task are the writer-side skew case — bound file size with
    * `spark.sql.files.maxRecordsPerFile` rather than pre-splitting here.
    */
  def write(df: DataFrame, path: String,
      partitionCols: Seq[String] = JsonDataset.PartitionCols): Unit = {
    val clustered =
      if (partitionCols.isEmpty) df
      else df.repartition(partitionCols.map(df.col): _*)
    clustered.write
      .mode("append")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** S5 — column-pruned scan; Catalyst pushes the projection to the
    * parquet footer, so this reads only the requested columns.
    */
  def read(spark: SparkSession, path: String, columns: Seq[String] = Nil): DataFrame = {
    val df = spark.read.parquet(path)
    if (columns.isEmpty) df else df.select(columns.map(df.col): _*)
  }
}
