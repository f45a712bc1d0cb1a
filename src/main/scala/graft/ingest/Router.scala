package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

import graft.validate.FileMetadata

/** File→dataset routing: P6 filename normalization plus the two-level
  * dataset-identifier lookup (J4): JSON-Schema `$id` → dataset via the
  * schema mapping, else the legacy (assessment, revision, filename) →
  * dataset mapping (s3_to_json_s3.py:493-556).
  */
object Router {

  /** P6 — basename + `microphone.json` → `microphone_levels.json`
    * (s3_to_json_s3.py:692-693).
    */
  def normalizeFileName(path: String): String = {
    val base = path.split('/').last
    if (base == "microphone.json") "microphone_levels.json" else base
  }

  /** Legacy assessment/revision/filename → dataset mapping
    * (dataset_mapping.json).
    */
  final case class DatasetMapping(
      byAssessment: Map[String, Map[String, Map[String, String]]]) {

    def contains(assessmentId: String, revision: String): Boolean =
      byAssessment.get(assessmentId).exists(_.contains(revision))

    def lookup(meta: FileMetadata): Option[String] =
      byAssessment.get(meta.assessmentId)
        .flatMap(_.get(meta.assessmentRevision.toString))
        .flatMap(_.get(meta.fileName))
  }

  /** Dataset identifier resolution (s3_to_json_s3.py:493-556): schema `$id`
    * through the schema mapping wins; files without a schema fall back to
    * the legacy mapping; unmapped files are skipped (None).
    */
  def datasetIdentifier(
      schemaId: Option[String],
      schemaMapping: Map[String, String],
      datasetMapping: DatasetMapping,
      meta: FileMetadata): Option[String] =
    schemaId.flatMap(schemaMapping.get).orElse(datasetMapping.lookup(meta))

  private val mapper = new ObjectMapper()

  def schemaMappingFromJson(json: String): Map[String, String] = {
    val root = mapper.readTree(json)
    root.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap
  }

  def datasetMappingFromJson(json: String): DatasetMapping = {
    val root = mapper.readTree(json).get("assessmentIdentifier")
    DatasetMapping(root.properties.asScala.map { a =>
      a.getKey -> a.getValue.get("assessmentRevision").properties.asScala.map { r =>
        r.getKey -> r.getValue.properties.asScala
          .map(f => f.getKey -> f.getValue.asText).toMap
      }.toMap
    }.toMap)
  }

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing resource $name")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** The production mappings bundled as resources. */
  lazy val defaultSchemaMapping: Map[String, String] =
    schemaMappingFromJson(resource("/graft/schema_mapping.json"))
  lazy val defaultDatasetMapping: DatasetMapping =
    datasetMappingFromJson(resource("/graft/dataset_mapping.json"))
}
