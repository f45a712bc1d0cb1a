package graft.validate

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** One file entry of the archive map: filename → schema URL. */
final case class SchemaRef(filename: String, jsonSchema: Option[String])

/** Assessment-scoped schemas at a given revision. */
final case class AssessmentEntry(
    assessmentIdentifier: String,
    assessmentRevision: Int,
    files: Seq[SchemaRef])

/** App-scoped schemas: per-organization defaults plus an anyOf list. */
final case class AppEntry(
    appId: String,
    default: Seq[SchemaRef],
    anyOf: Seq[SchemaRef])

/** File metadata driving resolution (s3_to_json_s3.py:179-205). */
final case class FileMetadata(
    assessmentId: String,
    assessmentRevision: Int,
    fileName: String,
    appId: String)

/** The archive-map model + 3-level schema resolution (V1,
  * s3_to_json_s3.py:179-282):
  *
  *  1. self-referencing schema from metadata.json `files[].jsonSchema`
  *     (highest precedence, s3_to_json_s3.py:222-228)
  *  2. assessment scope: among entries matching the assessment id with
  *     revision ≤ the record's, the NEAREST revision wins; only that one
  *     assessment's file list is consulted (:231-254)
  *  3. app scope: the `anyOf` match overrides the per-organization
  *     `default` match when both exist (:256-268 — default is assigned
  *     first, anyOf overwrites)
  *  4. inter-app `anyOf` (:270-280)
  */
final case class ArchiveMap(
    anyOf: Seq[SchemaRef],
    assessments: Seq[AssessmentEntry],
    apps: Seq[AppEntry]) {

  def resolveUrl(
      meta: FileMetadata,
      selfRefSchemas: Map[String, String] = Map.empty): Option[String] = {
    selfRefSchemas.get(meta.fileName).orElse {
      assessmentScoped(meta).orElse(appScoped(meta)).orElse(interApp(meta))
    }
  }

  private def assessmentScoped(meta: FileMetadata): Option[String] = {
    val valid = assessments.filter(a =>
      a.assessmentIdentifier == meta.assessmentId &&
        a.assessmentRevision <= meta.assessmentRevision)
    if (valid.isEmpty) None
    else {
      val nearest = valid.minBy(a => meta.assessmentRevision - a.assessmentRevision)
      nearest.files.find(_.filename == meta.fileName).flatMap(_.jsonSchema)
    }
  }

  private def appScoped(meta: FileMetadata): Option[String] =
    apps.find(_.appId == meta.appId).flatMap { app =>
      val fromDefault = app.default.find(_.filename == meta.fileName)
      val fromAnyOf = app.anyOf.find(_.filename == meta.fileName)
      // anyOf overwrites default (s3_to_json_s3.py:259-268)
      fromAnyOf.orElse(fromDefault).flatMap(_.jsonSchema)
    }

  private def interApp(meta: FileMetadata): Option[String] =
    anyOf.find(f => f.filename == meta.fileName && f.jsonSchema.isDefined)
      .flatMap(_.jsonSchema)
}

object ArchiveMap {
  private val mapper = new ObjectMapper()

  private def refs(n: JsonNode): Seq[SchemaRef] =
    if (n == null) Nil
    else n.elements.asScala.map { f =>
      SchemaRef(
        f.get("filename").asText,
        Option(f.get("jsonSchema")).map(_.asText))
    }.toSeq

  def fromJson(json: String): ArchiveMap = {
    val root = mapper.readTree(json)
    val assessments = Option(root.get("assessments")).toSeq
      .flatMap(_.elements.asScala)
      .map { a =>
        AssessmentEntry(
          a.get("assessmentIdentifier").asText,
          a.get("assessmentRevision").asInt,
          refs(a.get("files")))
      }
    val apps = Option(root.get("apps")).toSeq
      .flatMap(_.elements.asScala)
      .map { a =>
        AppEntry(
          a.get("appId").asText,
          Option(a.get("default")).toSeq.flatMap(_.elements.asScala)
            .flatMap(org => refs(org.get("files"))),
          refs(a.get("anyOf")))
      }
    ArchiveMap(refs(root.get("anyOf")), assessments, apps)
  }
}

/** V2 — URL→schema cache so each schema parses once per JVM
  * (s3_to_json_s3.py:285-299; offline: `fetch` reads bundled resources or
  * a pre-downloaded map instead of the network).
  */
final class SchemaCache(fetch: String => String) extends Serializable {
  private val memo = TrieMap.empty[String, JsonNode]
  private val mapper = new ObjectMapper()

  def get(url: String): JsonNode =
    memo.getOrElseUpdate(url, mapper.readTree(fetch(url)))

  def size: Int = memo.size
}
