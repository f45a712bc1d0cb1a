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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects by
      // default; read nanos as long, keep the raw nanos as `ts_ns` (windows
      // order by it for full-precision parity with the nanosecond oracle)
      // and restore a microsecond timestamp via exact integral division —
      // a double round-trip (ts / 1000.0) loses 1µs on ~12% of values
      // because ~1.7e18 exceeds double's 53-bit mantissa.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts_ns", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
