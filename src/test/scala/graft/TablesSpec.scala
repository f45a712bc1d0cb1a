package graft

import org.apache.spark.sql.types.{LongType, TimestampType}

/** Guards the loader contract against driver-side testdata regeneration.
  *
  * Round 7 lost 49 registry entries because `events.ts` changed parquet
  * physical type (TIMESTAMP(NANOS) → timestamp[us]) and the loader assumed
  * one shape. This spec materializes a row from EVERY table in EVERY sf dir
  * so a future regeneration fails here, loudly and named, instead of
  * silently nulling half the bench.
  */
class TablesSpec extends SparkSpec {
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    .filter(d => new java.io.File(d).isDirectory)

  test("at least one sf dir exists") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* dirs found")
  }

  for (dir <- sfDirs; name <- Tables.names) {
    test(s"$name loads and yields a row from $dir") {
      val df = Tables.load(spark, dir, name)
      assert(df.limit(1).count() == 1L, s"$name in $dir is empty")
    }
  }

  for (dir <- sfDirs) {
    test(s"events loader contract holds in $dir: ts is timestamp, ts_ns is long nanos") {
      val ev = Tables.load(spark, dir, "events")
      assert(ev.schema("ts").dataType == TimestampType,
        s"ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
      assert(ev.schema("ts_ns").dataType == LongType,
        s"ts_ns must be LongType nanos, got ${ev.schema("ts_ns").dataType}")
      // ts and ts_ns must agree at microsecond precision.
      import org.apache.spark.sql.functions._
      val off = ev
        .where(unix_micros(col("ts")) * lit(1000L) =!= col("ts_ns") - col("ts_ns") % lit(1000L))
        .limit(1).count()
      assert(off == 0L, "ts and ts_ns disagree at microsecond precision")
    }
  }
}
