package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** One member file of a ZIP archive. */
final case class ZipEntryRow(
    archivePath: String,
    entryName: String,
    content: Array[Byte])

/** S1 — distributed ZIP-archive source (s3_to_json_s3.py:786-799 fetches
  * and opens archives one at a time on the driver; here each archive is a
  * row of the binaryFile source and is decoded on an executor, so a
  * million archives fan out across the cluster).
  */
object ZipSource {

  /** Read every member of every ZIP under `pathGlob`. */
  def read(spark: SparkSession, pathGlob: String): Dataset[ZipEntryRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .load(pathGlob)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => entries(bytes).map {
        case (name, content) => ZipEntryRow(path, name, content)
      }}
  }

  /** Enumerate (entryName, bytes) of an in-memory ZIP. */
  def entries(zipBytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    val out = Seq.newBuilder[(String, Array[Byte])]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out += ((e.getName, zin.readAllBytes()))
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }
}
