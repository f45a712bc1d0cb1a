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

  def write(df: DataFrame, path: String,
      partitionCols: Seq[String] = JsonDataset.PartitionCols): Unit =
    df.write
      .mode("append")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** S5 — column-pruned scan; Catalyst pushes the projection to the
    * parquet footer, so this reads only the requested columns.
    */
  def read(spark: SparkSession, path: String, columns: Seq[String] = Nil): DataFrame = {
    val df = spark.read.parquet(path)
    if (columns.isEmpty) df else df.select(columns.map(df.col): _*)
  }
}
