package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.GenericData
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class AvroContainersSpec extends SparkSpec {
  import spark.implicits._

  test("write/read round-trips every supported type including nulls " +
      "and binary, across a multi-file layout") {
    val tmp = graft.EntryKit.scratchTracked("graft_avro").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("d", DoubleType), StructField("b", BooleanType),
      StructField("i", IntegerType), StructField("f", FloatType),
      StructField("bin", BinaryType)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, 7, 2.25f, Array[Byte](1, 2, 3)),
      Row(2L, null, null, false, null, null, null),
      Row(3L, "", -0.0, true, -1, 0.0f, Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    assert(AvroContainers.write(df, tmp, "id", numFiles = 3) == 3L)
    val back = AvroContainers.read(spark, tmp)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L).getString(1) == "alpha" && got(1L).getDouble(2) == 1.5)
    assert(got(1L).getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(2) &&
      got(2L).isNullAt(6))
    assert(got(3L).getString(1) == "" &&
      got(3L).getAs[Array[Byte]](6).isEmpty)
  }

  test("the layout is a pure function of the data: re-writing an " +
      "arbitrarily repartitioned frame yields byte-identical files") {
    val t1 = graft.EntryKit.scratchTracked("graft_avro_a").toString
    val t2 = graft.EntryKit.scratchTracked("graft_avro_b").toString
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    AvroContainers.write(df, t1, "id", numFiles = 4)
    AvroContainers.write(df.repartition(13).sort($"v".desc), t2, "id",
      numFiles = 4)
    def bytes(root: String): Map[String, Seq[Byte]] =
      new java.io.File(root).listFiles().filter(_.getName.endsWith(".avro"))
        .map(f => f.getName -> Files.readAllBytes(f.toPath).toSeq).toMap
    assert(bytes(t1) == bytes(t2))
  }

  test("unsupported column types are rejected up front") {
    val df = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException](
      AvroContainers.write(df, "/tmp/never", "id", 1))
    assert(e.getMessage.contains("unsupported Avro field type"))
  }

  test("containers written here are read by the reference Avro reader " +
      "(and vice versa through roundTripBytes)") {
    val s: Schema = SchemaBuilder.record("R").fields()
      .optionalLong("x").optionalString("y").endRecord()
    val r1 = new GenericData.Record(s)
    r1.put("x", 5L); r1.put("y", "hi")
    val out = AvroContainers.roundTripBytes(s, Seq(r1))
    assert(out.length == 1 && out.head.get("x") == 5L &&
      out.head.get("y").toString == "hi")
  }
}
