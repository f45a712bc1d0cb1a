package graft.validate

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Offline JSON-Schema validator (V3) covering the keyword surface the
  * reference's schemas exercise: type, required, properties,
  * additionalProperties, items, enum, const, allOf/anyOf, and
  * same-document `$ref` (JSON Pointer `#/...` and `$id` anchors like
  * `#FileInfo`, the shape the reference's ArchiveMetadata schema uses
  * for its FileInfo items) (s3_to_json_s3.py:302-415 delegates to
  * python-jsonschema; we validate on the JVM with no network — schemas
  * are bundled/cached, V2).
  *
  * `$id` handling and the v0 workaround: references always resolve
  * against the ROOT schema document, never against a base URI derived
  * from `$id`. This bakes in the reference's `schemas/v0/` workaround
  * (s3_to_json_s3.py:405-415, python-jsonschema issue 1012): there a
  * relative root `$id` breaks `$ref` resolution and the reference
  * substitutes `$id: ""` before validating — same-document resolution,
  * which is exactly what this resolver does for EVERY schema, so v0 and
  * v2 schemas with identical bodies validate identically. Truly
  * external refs (another document) are unresolvable offline and fail
  * loudly instead of silently passing.
  *
  * Error messages reproduce python-jsonschema's phrasing (including its
  * repr of instances: None/True/False, single-quoted strings) because the
  * expected-error allowlists (V4, s3_to_json_s3.py:418-490) match on those
  * exact strings.
  */
object JsonSchemaValidator {

  private val mapper = new ObjectMapper()

  /** Refs deeper than this mean a `$ref` cycle (a schema referencing
    * itself without consuming input) — fail fast instead of overflowing
    * the task stack.
    */
  private val MaxRefDepth = 64

  def validate(dataJson: String, schemaJson: String): Seq[String] =
    validate(mapper.readTree(dataJson), mapper.readTree(schemaJson))

  def validate(data: JsonNode, schema: JsonNode): Seq[String] = {
    val errs = Seq.newBuilder[String]
    check(data, schema, schema, 0, errs)
    errs.result()
  }

  /** Same-document `$ref` resolution: `#` (root), `#/json/pointer`, or
    * `#anchor` matching a nested subschema's `$id`. Anything pointing
    * outside the document throws — offline validation cannot fetch, and
    * a silently-skipped constraint would pass invalid records.
    */
  private def resolveRef(ref: String, root: JsonNode): JsonNode =
    if (ref == "#") root
    else if (ref.startsWith("#/")) {
      val node = root.at(ref.substring(1))
      if (node.isMissingNode) throw new IllegalArgumentException(
        s"unresolvable JSON-Schema $$ref '$ref': no such pointer in the " +
          "schema document")
      node
    } else if (ref.startsWith("#")) {
      findAnchor(root, ref).getOrElse(throw new IllegalArgumentException(
        s"unresolvable JSON-Schema $$ref '$ref': no subschema with that " +
          "$id anchor"))
    } else throw new IllegalArgumentException(
      s"external JSON-Schema $$ref '$ref' cannot be resolved offline — " +
        "bundle the referenced schema into the document")

  /** Depth-first search for a subschema whose `$id` equals `anchor`
    * (draft-07 plain-name fragments, e.g. `$id: "#FileInfo"`).
    */
  private def findAnchor(node: JsonNode, anchor: String): Option[JsonNode] = {
    if (node.isObject) {
      val id = node.get("$id")
      if (id != null && id.isTextual && id.asText == anchor) return Some(node)
    }
    if (node.isObject || node.isArray)
      node.elements.asScala.foreach { child =>
        val hit = findAnchor(child, anchor)
        if (hit.isDefined) return hit
      }
    None
  }

  /** python repr of a JSON value, as embedded in jsonschema messages. */
  private[validate] def pyRepr(n: JsonNode): String =
    if (n == null || n.isNull) "None"
    else if (n.isBoolean) { if (n.asBoolean) "True" else "False" }
    else if (n.isTextual) s"'${n.asText}'"
    else if (n.isNumber) n.numberValue.toString
    else if (n.isArray) n.elements.asScala.map(pyRepr).mkString("[", ", ", "]")
    else if (n.isObject)
      n.properties.asScala
        .map(e => s"'${e.getKey}': ${pyRepr(e.getValue)}")
        .mkString("{", ", ", "}")
    else n.toString

  private def typeMatches(n: JsonNode, t: String): Boolean = t match {
    case "object" => n.isObject
    case "array" => n.isArray
    case "string" => n.isTextual
    case "integer" => n.isIntegralNumber
    case "number" => n.isNumber
    case "boolean" => n.isBoolean
    case "null" => n.isNull
    case _ => true
  }

  private def check(n: JsonNode, schema: JsonNode, root: JsonNode, depth: Int,
      errs: scala.collection.mutable.Builder[String, Seq[String]]): Unit = {
    if (schema == null || !schema.isObject) return
    if (depth > MaxRefDepth) throw new IllegalArgumentException(
      s"JSON-Schema $$ref nesting exceeds $MaxRefDepth — reference cycle?")

    // draft-07: a $ref REPLACES the subschema (sibling keywords ignored)
    val refNode = schema.get("$ref")
    if (refNode != null && refNode.isTextual) {
      check(n, resolveRef(refNode.asText, root), root, depth + 1, errs)
      return
    }

    Option(schema.get("type")).foreach { t =>
      val types =
        if (t.isArray) t.elements.asScala.map(_.asText).toSeq
        else Seq(t.asText)
      if (!types.exists(typeMatches(n, _))) {
        val shown = types.map(x => s"'$x'").mkString(", ")
        errs += s"${pyRepr(n)} is not of type $shown"
      }
    }

    Option(schema.get("enum")).foreach { e =>
      val values = e.elements.asScala.toSeq
      if (!values.exists(_ == n))
        errs += s"${pyRepr(n)} is not one of ${values.map(pyRepr).mkString("[", ", ", "]")}"
    }

    Option(schema.get("const")).foreach { c =>
      if (c != n) errs += s"${pyRepr(c)} was expected"
    }

    if (n.isObject) {
      Option(schema.get("required")).foreach { req =>
        req.elements.asScala.foreach { r =>
          if (!n.has(r.asText)) errs += s"'${r.asText}' is a required property"
        }
      }
      val props = Option(schema.get("properties"))
      props.foreach { p =>
        p.properties.asScala.foreach { e =>
          if (n.has(e.getKey))
            check(n.get(e.getKey), e.getValue, root, depth + 1, errs)
        }
      }
      Option(schema.get("additionalProperties")).foreach { ap =>
        if (ap.isBoolean && !ap.asBoolean) {
          val declared = props.map(_.fieldNames.asScala.toSet).getOrElse(Set.empty[String])
          val extras = n.fieldNames.asScala.filterNot(declared).toSeq.sorted
          if (extras.nonEmpty) {
            val shown = extras.map(x => s"'$x'").mkString(", ")
            val verb = if (extras.size == 1) "was" else "were"
            errs += s"Additional properties are not allowed ($shown $verb unexpected)"
          }
        }
      }
    }

    if (n.isArray) {
      Option(schema.get("items")).foreach { items =>
        if (items.isObject)
          n.elements.asScala.foreach(el =>
            check(el, items, root, depth + 1, errs))
      }
    }

    Option(schema.get("allOf")).foreach { all =>
      all.elements.asScala.foreach(sub =>
        check(n, sub, root, depth + 1, errs))
    }

    Option(schema.get("anyOf")).foreach { any =>
      val branches = any.elements.asScala.toSeq
      val ok = branches.exists { sub =>
        val branchErrs = Seq.newBuilder[String]
        check(n, sub, root, depth + 1, branchErrs)
        branchErrs.result().isEmpty
      }
      if (!ok)
        errs += s"${pyRepr(n)} is not valid under any of the given schemas"
    }
  }
}
