package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory and read the Hive-less
  * single-file parquet tables. Catalyst prunes columns/predicates at
  * the scan, so loaders stay schema-free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects by default;
    // read nanos as long and restore microsecond timestamps (UTC session tz).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    else df
  }
}
