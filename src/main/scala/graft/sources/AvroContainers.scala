package graft.sources

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro object-container source and sink (S19) — the interchange format
  * half the data-engineering world hands over when it isn't parquet:
  * schema'd, blocked, splittable row files. The Spark distribution here
  * ships the Avro CORE libraries but not the `spark-avro` connector, so
  * this implements the container read/write directly on the public
  * `org.apache.avro.file` API — the ZipSource/TarShards discipline: a
  * missing connector is a reason to write one, not to drop the format.
  *
  * Supported Spark types: long/int/double/float/boolean/string/binary,
  * all written as nullable unions (the Avro-idiomatic `["null", T]`).
  * The writer pins a deterministic layout — hash-repartition by the key
  * column, sort within partitions — so file contents are a pure
  * function of data, not of upstream partitioning (reproducible
  * builds, the TarShards rule). No compression codec: the environment
  * pins zero extra deps, and null-codec containers are read by every
  * Avro tool.
  *
  * Scale shape: the write is one repartition + per-partition streamed
  * append (one open container per task, O(row) memory). The read lists
  * files through Spark's `binaryFile` source (one task per container;
  * a pushed pathGlobFilter prunes strays), discovers the schema from
  * ONE file's header on the driver (a bounded metadata read, the
  * k×dim-model discipline), and parses blocks executor-side.
  */
object AvroContainers {

  private def toAvro(st: StructType): Schema = {
    val b = SchemaBuilder.record("GraftRow").namespace("graft").fields()
    st.fields.foldLeft(b) { (fb, f) =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other =>
          throw new IllegalArgumentException(
            s"unsupported Avro field type: ${f.name}: $other")
      }
      fb.name(f.name).`type`(Schema.createUnion(
        Schema.create(Schema.Type.NULL), base)).withDefault(null)
    }.endRecord()
  }

  private def toSpark(s: Schema): StructType = {
    def unwrap(fs: Schema): Schema =
      if (fs.getType == Schema.Type.UNION)
        fs.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else fs
    StructType(s.getFields.asScala.toSeq.map { f =>
      val dt = unwrap(f.schema()).getType match {
        case Schema.Type.LONG => LongType
        case Schema.Type.INT => IntegerType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case other =>
          throw new IllegalArgumentException(s"unsupported Avro type: $other")
      }
      StructField(f.name(), dt, nullable = true)
    })
  }

  /** Write `df` as `numFiles` Avro object containers under `root`,
    * hash-routed and sorted by `keyCol` for a layout that is a pure
    * function of the data. Returns the number of files written.
    */
  def write(df: DataFrame, root: String, keyCol: String,
      numFiles: Int): Long = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val schema = df.schema
    val avroJson = toAvro(schema).toString
    val fieldNames = schema.fieldNames
    val routed = df.repartition(numFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
    routed.rdd.mapPartitionsWithIndex { (part, rows) =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val conf = new org.apache.hadoop.conf.Configuration()
      val dir = new org.apache.hadoop.fs.Path(root)
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(dir, f"part-$part%05d.avro"), true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avroSchema))
      // deterministic sync marker (md5 of the partition index): the
      // container spec only needs 16 bytes unlikely to appear in data;
      // deriving them from the layout keeps file bytes a pure function
      // of content (DataFileWriter's default marker is RANDOM — the
      // one nondeterminism in an otherwise reproducible write)
      w.create(avroSchema, out,
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"graft-avro-$part".getBytes("UTF-8")))
      var c = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(avroSchema)
        var i = 0
        while (i < fieldNames.length) {
          val v = row.get(i) match {
            case null => null
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case x => x
          }
          rec.put(fieldNames(i), v)
          i += 1
        }
        w.append(rec)
        c += 1
      }
      w.close()
      Iterator.single(c)
    }.sum().toLong
  }

  /** Read every `*.avro` container under `root` back into a DataFrame.
    * Schema comes from one file's header (driver-side bounded read);
    * all files must share it — mixed schemas throw on the executor, by
    * design (schema evolution is `pipeline/SchemaEvolution`'s job).
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .load(root)
      .select(col("path"), col("content"))
    import spark.implicits._
    val first = files.select(col("content")).as[Array[Byte]].head()
    val avroJson = {
      val r = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(first),
        new GenericDatumReader[GenericRecord]())
      try r.getSchema.toString finally r.close()
    }
    val sparkSchema = toSpark(new Schema.Parser().parse(avroJson))
    val width = sparkSchema.length
    val rdd = files.as[(String, Array[Byte])].rdd.flatMap {
      case (_, bytes) =>
        val reader = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes),
          new GenericDatumReader[GenericRecord]())
        val expect = new Schema.Parser().parse(avroJson)
        require(reader.getSchema == expect,
          s"container schema drift: ${reader.getSchema}")
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          override def next(): Row = {
            val rec = reader.next()
            Row.fromSeq((0 until width).map { i =>
              rec.get(i) match {
                case u: Utf8 => u.toString
                case bb: java.nio.ByteBuffer =>
                  val a = new Array[Byte](bb.remaining()); bb.get(a); a
                case v => v
              }
            })
          }
        }
    }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** In-memory round-trip of one container — the spec-facing helper
    * proving the bytes we write are bytes any Avro reader accepts.
    */
  private[sources] def roundTripBytes(schema: Schema,
      recs: Seq[GenericRecord]): Seq[GenericRecord] = {
    val bos = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, bos)
    recs.foreach(w.append)
    w.close()
    val r = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bos.toByteArray),
      new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[GenericRecord]
      while (r.hasNext) out += r.next()
      out.result()
    } finally r.close()
  }
}
