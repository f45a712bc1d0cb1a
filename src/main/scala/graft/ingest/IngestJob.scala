package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import java.time.OffsetDateTime
import java.time.format.DateTimeFormatter

import scala.jdk.CollectionConverters._

import graft.validate.{ArchiveMap, ErrorSuppression, FileMetadata, JsonSchemaValidator, SchemaCache}

/** One Bridge record: the ZIP archive plus its S3 object metadata
  * (recordid, assessmentid, assessmentrevision, uploadedon, clientinfo, …
  * — the ~22-field surface of tests/test_s3_to_json_s3.py:173-198).
  */
final case class RawRecord(metadata: Map[String, String], zipBytes: Array[Byte])

/** An NDJSON line routed to its dataset with partition values attached. */
final case class RoutedLine(
    dataset: String,
    assessmentid: String,
    year: Int,
    month: Int,
    day: Int,
    recordid: String,
    line: String)

/** A failed-validation record headed for the quarantine sink (S7). */
final case class InvalidRecord(
    recordid: String,
    assessmentid: String,
    fileName: String,
    errors: Seq[String])

/** Union row for the single-pass validate+route flatMap (Spark has no
  * Either encoder; a pair of Options encodes fine).
  */
final case class IngestOut(
    valid: Option[RoutedLine], invalid: Option[InvalidRecord])

/** Stage-1 ingest (E1, s3_to_json_s3.py:733-832), Spark-native: records
  * arrive as a Dataset and every step — unzip, schema resolution,
  * validation, suppression, routing, field injection — runs executor-side
  * in one narrow flatMap. The reference loops records on a single driver;
  * this shape fans the same per-record logic across the cluster, and the
  * partitioned NDJSON write replaces its per-file S3 puts.
  */
object IngestJob {

  final case class Config(
      archiveMap: ArchiveMap,
      schemas: SchemaCache,
      schemaMapping: Map[String, String],
      datasetMapping: Router.DatasetMapping,
      appId: String = "mobile-toolbox")

  private val mapper = new ObjectMapper()

  /** Self-referencing schemas from metadata.json files[].jsonSchema
    * (s3_to_json_s3.py:29-48).
    */
  def selfRefSchemas(entries: Seq[(String, Array[Byte])]): Map[String, String] =
    entries.collectFirst { case ("metadata.json", bytes) => bytes } match {
      case None => Map.empty
      case Some(bytes) =>
        val meta = mapper.readTree(bytes)
        Option(meta.get("files")).toSeq
          .flatMap(_.elements.asScala)
          .flatMap { f =>
            (Option(f.get("filename")), Option(f.get("jsonSchema"))) match {
              case (Some(n), Some(s)) => Some(n.asText -> s.asText)
              case _ => None
            }
          }.toMap
    }

  /** V3+V4 for one record: file → unexpected errors (empty map = valid).
    * Records mapped in the legacy dataset mapping skip validation
    * (validate_data, s3_to_json_s3.py:302-415).
    */
  def validateRecord(record: RawRecord, cfg: Config): Map[String, Seq[String]] = {
    val md = record.metadata
    val assessmentId = md("assessmentid")
    val revision = md("assessmentrevision")
    if (cfg.datasetMapping.contains(assessmentId, revision)) return Map.empty
    val entries = ZipSource.entries(record.zipBytes)
    val selfRef = selfRefSchemas(entries)
    val errors = entries.flatMap { case (path, bytes) =>
      val meta = FileMetadata(
        assessmentId, revision.toInt, Router.normalizeFileName(path), cfg.appId)
      cfg.archiveMap.resolveUrl(meta, selfRef).flatMap { url =>
        val errs = JsonSchemaValidator.validate(
          mapper.readTree(bytes), cfg.schemas.get(url))
        if (errs.nonEmpty) Some(path -> errs) else None
      }
    }.toMap
    ErrorSuppression.cap(
      ErrorSuppression.suppress(errors, cfg.appId, md.getOrElse("clientinfo", "")))
  }

  /** Route every member file of a valid record to its dataset, injecting
    * the partition fields (and, for ArchiveMetadata, every metadata field)
    * into each JSON object. Top-level JSON arrays are normalized to one
    * line per element (subsuming the reference's `$[*]` crawler
    * classifier). Mirrors process_record + write_file_to_json_dataset
    * (s3_to_json_s3.py:560-730).
    */
  def routeRecord(record: RawRecord, cfg: Config): Seq[RoutedLine] = {
    val md = record.metadata
    val assessmentId = md("assessmentid")
    val revision = md("assessmentrevision")
    val recordId = md("recordid")
    val uploadedOn = OffsetDateTime.parse(
      md("uploadedon"), DateTimeFormatter.ISO_OFFSET_DATE_TIME)
    val entries = ZipSource.entries(record.zipBytes)
    val selfRef = selfRefSchemas(entries)
    entries.flatMap { case (path, bytes) =>
      val fileName = Router.normalizeFileName(path)
      val meta = FileMetadata(assessmentId, revision.toInt, fileName, cfg.appId)
      val schemaId = cfg.archiveMap.resolveUrl(meta, selfRef)
        .map(url => cfg.schemas.get(url))
        .flatMap(s => Option(s.get("$id")).map(_.asText))
      Router.datasetIdentifier(
          schemaId, cfg.schemaMapping, cfg.datasetMapping, meta).toSeq
        .flatMap { dataset =>
          val schemaIdent = dataset.split("_").head
          val root = mapper.readTree(bytes)
          val objs: Seq[ObjectNode] =
            if (root.isArray)
              root.elements.asScala.collect { case o: ObjectNode => o }.toSeq
            else root match {
              case o: ObjectNode => Seq(o)
              case _ => Nil
            }
          objs.map { o =>
            if (schemaIdent == "ArchiveMetadata" || schemaIdent == "TaskMetadata") {
              // every metadata field goes into the metadata dataset
              md.foreach { case (k, v) => o.put(k, v) }
            }
            o.put("assessmentid", assessmentId)
            o.put("year", uploadedOn.getYear)
            o.put("month", uploadedOn.getMonthValue)
            o.put("day", uploadedOn.getDayOfMonth)
            o.put("recordid", recordId)
            RoutedLine(
              dataset, assessmentId, uploadedOn.getYear,
              uploadedOn.getMonthValue, uploadedOn.getDayOfMonth,
              recordId, mapper.writeValueAsString(o))
          }
        }
    }
  }

  /** Full stage-1 run over a Dataset of records: validate, split
    * valid/invalid, write valid lines to partitioned NDJSON datasets and
    * invalid records to the quarantine sink (S7). Returns the routed lines
    * for inspection.
    *
    * Scale design: the unzip+validate flatMap is the expensive stage and
    * two sinks need its output. Rather than pinning the whole routed
    * corpus in executor storage (`.cache`) to feed both, the run stages
    * the union rows ONCE as parquet partitioned by validity. The valid
    * branch is then a column-pruned scan of `is_valid=true`; the invalid
    * branch is skipped entirely via a filesystem existence check (no
    * Spark action); and a failed downstream write restarts from the
    * staging files instead of re-unzipping the corpus. The staging root
    * is `_`-prefixed so NDJSON scans, bookmarks and downstream listings
    * treat it as hidden. Each run stages under its own subdirectory and
    * keeps the previous run's (the returned frames are lazy scans a
    * caller may still be consuming); older generations are reclaimed at
    * the start of the next run. One writer per jsonRoot at a time — the
    * reference's one-Glue-job-per-dataset assumption.
    *
    * Storage envelope: by default up to TWO staged generations exist on
    * disk during a run (this run's plus the previous one) — at 100 TB
    * that doubles stage-1 storage. `spark.graft.ingest.staging.ttlSeconds`
    * is the reclaim valve: a previous generation older than the TTL is
    * deleted at run start even though it is the newest; `0` reclaims the
    * previous generation immediately (envelope = 1 generation, for
    * callers that consume the returned frames before the next run).
    */
  def run(
      spark: SparkSession,
      records: Dataset[RawRecord],
      cfg: Config,
      jsonRoot: String,
      quarantinePath: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val routed = records.flatMap { r =>
      val errs = validateRecord(r, cfg)
      if (errs.isEmpty) routeRecord(r, cfg).map(l => IngestOut(Some(l), None))
      else errs.toSeq.map { case (f, es) =>
        IngestOut(None, Some(InvalidRecord(r.metadata("recordid"),
          r.metadata("assessmentid"), f, es)))
      }
    }
    val stagingRoot = new org.apache.hadoop.fs.Path(s"$jsonRoot/_staging")
    val stagingFs = stagingRoot.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // retention: this run + the immediately previous one stay readable;
    // anything older is reclaimed now. With the TTL conf set, the
    // previous generation is also reclaimed once expired (see scaladoc)
    val ttlMs = spark.conf.getOption("spark.graft.ingest.staging.ttlSeconds")
      .map(_.toLong * 1000L)
    if (stagingFs.exists(stagingRoot)) {
      val gens = stagingFs.listStatus(stagingRoot).filter(_.isDirectory)
        .sortBy(_.getModificationTime)
      gens.dropRight(1).foreach(d => stagingFs.delete(d.getPath, true))
      val now = System.currentTimeMillis()
      gens.takeRight(1)
        .filter(d => ttlMs.exists(t => now - d.getModificationTime >= t))
        .foreach(d => stagingFs.delete(d.getPath, true))
    }
    val staging =
      s"$stagingRoot/run-${java.util.UUID.randomUUID().toString.take(8)}"
    val tagged = routed.withColumn("is_valid", $"valid".isNotNull)
    tagged.write.mode("overwrite").partitionBy("is_valid").parquet(staging)
    // explicit schema: a run with zero records writes no part files, and
    // schema inference would fail on the empty directory
    val staged = spark.read.schema(tagged.schema).parquet(staging)
    val valid = staged.where($"is_valid").select($"valid.*")
    val invalid = staged.where(!$"is_valid").select($"invalid.*")
    // text sink: one data column (the pre-serialized NDJSON line) + the
    // Hive partition columns — the reference's per-file S3 put loop
    // becomes a single distributed partitioned write
    valid.select("line", "dataset", "assessmentid", "year", "month", "day")
      .write.mode("append")
      .partitionBy("dataset", "assessmentid", "year", "month", "day")
      .text(jsonRoot)
    val invalidDir = new org.apache.hadoop.fs.Path(staging, "is_valid=false")
    val fs = invalidDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(invalidDir))
      invalid.write.mode("append").json(quarantinePath)
    (valid, invalid)
  }
}
