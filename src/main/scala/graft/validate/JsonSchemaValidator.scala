package graft.validate

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Offline JSON-Schema validator (V3) covering the keyword surface the
  * reference's schemas exercise: type, required, properties,
  * additionalProperties, items, enum, const, allOf/anyOf
  * (s3_to_json_s3.py:302-415 delegates to python-jsonschema; we validate
  * on the JVM with no network — schemas are bundled/cached, V2).
  *
  * Error messages reproduce python-jsonschema's phrasing (including its
  * repr of instances: None/True/False, single-quoted strings) because the
  * expected-error allowlists (V4, s3_to_json_s3.py:418-490) match on those
  * exact strings.
  */
object JsonSchemaValidator {

  private val mapper = new ObjectMapper()

  def validate(dataJson: String, schemaJson: String): Seq[String] =
    validate(mapper.readTree(dataJson), mapper.readTree(schemaJson))

  def validate(data: JsonNode, schema: JsonNode): Seq[String] = {
    val errs = Seq.newBuilder[String]
    check(data, schema, errs)
    errs.result()
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

  private def check(n: JsonNode, schema: JsonNode,
      errs: scala.collection.mutable.Builder[String, Seq[String]]): Unit = {
    if (schema == null || !schema.isObject) return

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
          if (n.has(e.getKey)) check(n.get(e.getKey), e.getValue, errs)
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
          n.elements.asScala.foreach(el => check(el, items, errs))
      }
    }

    Option(schema.get("allOf")).foreach { all =>
      all.elements.asScala.foreach(sub => check(n, sub, errs))
    }

    Option(schema.get("anyOf")).foreach { any =>
      val branches = any.elements.asScala.toSeq
      val ok = branches.exists(sub => validate(n, sub).isEmpty)
      if (!ok)
        errs += s"${pyRepr(n)} is not valid under any of the given schemas"
    }
  }
}
