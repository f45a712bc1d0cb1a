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
      // events.ts has shipped as either TIMESTAMP(NANOS) or plain
      // timestamp[us] parquet depending on the generator version; adapt to
      // whatever schema is on disk rather than assuming one. Consumers get a
      // stable contract: `ts` is a microsecond timestamp and `ts_ns` is a
      // long (windows order by ts_ns for full-precision, tie-stable parity
      // with the oracle).
      // A TIMESTAMP(NANOS) file cannot even be schema-inferred without the
      // legacy nanosAsLong conf, so only set it when the plain read fails —
      // the current (µs) testdata never mutates session state.
      val raw =
        try spark.read.parquet(s"$dir/$name.parquet")
        catch {
          case e: Exception if e.getMessage != null && e.getMessage.contains("NANOS") =>
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.read.parquet(s"$dir/$name.parquet")
        }
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // TIMESTAMP(NANOS) read back as long via nanosAsLong. Restore a
          // microsecond timestamp with exact integral division — a double
          // round-trip (ts / 1000.0) loses 1µs on ~12% of values because
          // ~1.7e18 exceeds double's 53-bit mantissa.
          raw
            .withColumn("ts_ns", col("ts"))
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: org.apache.spark.sql.types.TimestampNTZType |
            _: org.apache.spark.sql.types.TimestampType =>
          // Native microsecond timestamp. Normalize NTZ → TimestampType (a
          // no-op under the UTC session tz every entrypoint sets) so every
          // consumer sees the same type as the nanos path produced, and
          // derive ts_ns from micros.
          raw
            .withColumn("ts", col("ts").cast("timestamp"))
            .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
        case other =>
          throw new IllegalStateException(
            s"events.ts has unsupported type $other; expected long (nanos) or timestamp")
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
