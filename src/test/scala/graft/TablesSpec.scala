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

  test("legacy TIMESTAMP(NANOS) events parquet loads through the fallback " +
      "branch with the same ts/ts_ns contract") {
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.hadoop.fs.Path

    val dir = graft.EntryKit.scratchTracked("graft-nanos-events")
    dir.toFile.deleteOnExit()
    val schema = Types.buildMessage()
      .addField(Types.primitive(PrimitiveTypeName.INT64,
          org.apache.parquet.schema.Type.Repetition.REQUIRED)
        .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS))
        .named("ts"))
      .addField(Types.primitive(PrimitiveTypeName.INT64,
          org.apache.parquet.schema.Type.Repetition.REQUIRED)
        .named("event_id"))
      .named("events")
    val conf = new org.apache.hadoop.conf.Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withConf(conf)
      .build()
    // 1.7e18 ns exceeds double's 53-bit mantissa — the value class the
    // exact-integral-division comment in Tables.load exists for
    val nanos = Seq(1700000000123456789L, 1700000000123457789L, 1700000001000000001L)
    nanos.zipWithIndex.foreach { case (ns, i) =>
      val g = new SimpleGroup(schema)
      g.add("ts", ns)
      g.add("event_id", i.toLong)
      writer.write(g)
    }
    writer.close()

    val ev = Tables.load(spark, dir.toString, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("ts_ns").dataType == LongType)
    import org.apache.spark.sql.functions._
    val got = ev.select(col("ts_ns"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.map(_._1).toSeq == nanos.sorted, "raw nanos must ride ts_ns")
    got.foreach { case (ns, us) =>
      assert(us == ns / 1000L, s"ts must be exact integral-µs of $ns, got $us")
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
