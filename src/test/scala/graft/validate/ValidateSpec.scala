package graft.validate

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference stage-1 unit-test matrices:
  * schema resolution (tests/test_s3_to_json_s3.py:369-447),
  * validation (:547-571), suppression (:614-700).
  */
class ValidateSpec extends AnyFunSuite {

  // The archive-map fixture from tests/test_s3_to_json_s3.py:63-121
  private val archiveMapJson =
    """{
      "anyOf": [
        {"filename": "metadata.json", "isRequired": true,
         "jsonSchema": "https://example.org/v2/ArchiveMetadata.json"}
      ],
      "assessments": [
        {"assessmentIdentifier": "spelling", "assessmentRevision": 5,
         "files": [
           {"filename": "taskData.json", "contentType": "application/json",
            "isRequired": true, "jsonSchema": "https://example.org/taskData_combinedSchema.json"}
         ]}
      ],
      "apps": [
        {"appId": "mobile-toolbox", "iOS": 0, "android": 0,
         "default": [
           {"organization": "Example Org", "files": [
             {"filename": "assessmentResult.json", "isRequired": true,
              "jsonSchema": "https://example.org/v2/AssessmentResultObject.json"}
           ]}
         ],
         "anyOf": [
           {"filename": "motion.json", "isRequired": false,
            "jsonSchema": "https://example.org/v2/MotionRecord.json"},
           {"filename": "microphone_levels.json", "isRequired": false,
            "jsonSchema": "https://example.org/v2/AudioLevelRecord.json"}
         ]}
      ]
    }"""

  private val am = ArchiveMap.fromJson(archiveMapJson)

  private def meta(file: String, rev: Int = 5) =
    FileMetadata("spelling", rev, file, "mobile-toolbox")

  test("V1: universal (inter-app anyOf) file resolves") {
    assert(am.resolveUrl(meta("metadata.json"))
      .contains("https://example.org/v2/ArchiveMetadata.json"))
  }

  test("V1: assessment-specific file resolves at matching revision") {
    assert(am.resolveUrl(meta("taskData.json"))
      .contains("https://example.org/taskData_combinedSchema.json"))
  }

  test("V1: assessment entry requires revision >= entry revision") {
    // record at revision 4 < entry revision 5 → no assessment match,
    // taskData.json has no app/inter-app fallback → None
    assert(am.resolveUrl(meta("taskData.json", rev = 4)).isEmpty)
  }

  test("V1: nearest revision wins among multiple qualifying entries") {
    val multi = ArchiveMap.fromJson(
      """{"anyOf": [], "apps": [],
          "assessments": [
            {"assessmentIdentifier": "a", "assessmentRevision": 1,
             "files": [{"filename": "f.json", "jsonSchema": "u1"}]},
            {"assessmentIdentifier": "a", "assessmentRevision": 3,
             "files": [{"filename": "f.json", "jsonSchema": "u3"}]},
            {"assessmentIdentifier": "a", "assessmentRevision": 7,
             "files": [{"filename": "f.json", "jsonSchema": "u7"}]}
          ]}""")
    def at(rev: Int) =
      multi.resolveUrl(FileMetadata("a", rev, "f.json", "app"))
    assert(at(2).contains("u1"))
    assert(at(3).contains("u3"))
    assert(at(6).contains("u3"))
    assert(at(9).contains("u7"))
  }

  test("V1: app-specific anyOf file resolves") {
    assert(am.resolveUrl(meta("motion.json"))
      .contains("https://example.org/v2/MotionRecord.json"))
  }

  test("V1: app-specific default file resolves") {
    assert(am.resolveUrl(meta("assessmentResult.json"))
      .contains("https://example.org/v2/AssessmentResultObject.json"))
  }

  test("V1: unlisted filename resolves to None " +
      "(test_get_json_schema_unlisted_filename)") {
    assert(am.resolveUrl(meta("jellybeanz.json")).isEmpty)
  }

  test("V1: self-referencing schema takes precedence over archive map") {
    val selfRef = Map("taskData.json" -> "https://self.example/schema.json")
    assert(am.resolveUrl(meta("taskData.json"), selfRef)
      .contains("https://self.example/schema.json"))
  }

  test("V2: schema cache fetches each URL once") {
    var fetches = 0
    val cache = new SchemaCache(url => { fetches += 1; s"""{"$$id": "$url"}""" })
    cache.get("u1"); cache.get("u1"); cache.get("u2")
    assert(fetches == 2)
    assert(cache.size == 2)
  }

  // ------------------------------------------------------------------
  // V3 — validator behavior (python-jsonschema message parity)
  // ------------------------------------------------------------------

  test("V3: valid document yields no errors; added required property " +
      "yields exactly one (test_validate_against_schema)") {
    val schema =
      """{"type": "object",
          "required": ["appName"],
          "properties": {"appName": {"type": "string"}}}"""
    assert(JsonSchemaValidator.validate("""{"appName": "mtb"}""", schema).isEmpty)
    val withCookies =
      """{"type": "object",
          "required": ["appName", "cookies"],
          "properties": {"appName": {"type": "string"},
                         "cookies": {"type": "string"}}}"""
    val errs = JsonSchemaValidator.validate("""{"appName": "mtb"}""", withCookies)
    assert(errs == Seq("'cookies' is a required property"))
  }

  test("V3: message parity with the V4 allowlist strings") {
    // required
    assert(JsonSchemaValidator.validate("{}",
      """{"required": ["files"]}""") == Seq("'files' is a required property"))
    // additionalProperties singular
    assert(JsonSchemaValidator.validate("""{"a": 1, "type": 2}""",
      """{"properties": {"a": {}}, "additionalProperties": false}""")
      == Seq("Additional properties are not allowed ('type' was unexpected)"))
    // enum with python list repr
    val enumSchema =
      """{"enum": ["accelerometer", "gyro"]}"""
    assert(JsonSchemaValidator.validate("\"acceleration\"", enumSchema)
      == Seq("'acceleration' is not one of ['accelerometer', 'gyro']"))
    // None type mismatch
    assert(JsonSchemaValidator.validate("null", """{"type": "integer"}""")
      == Seq("None is not of type 'integer'"))
  }

  test("V3: nested properties and array items recurse") {
    val schema =
      """{"type": "object", "properties": {
           "xs": {"type": "array", "items": {"type": "integer"}},
           "s":  {"type": "object", "required": ["k"]}}}"""
    val errs = JsonSchemaValidator.validate(
      """{"xs": [1, "two", 3], "s": {}}""", schema)
    assert(errs.toSet == Set(
      "'two' is not of type 'integer'",
      "'k' is a required property"))
  }

  test("V3: $ref resolves against the document root — pointer refs, $id " +
      "anchors, and the v0 relative-$id workaround " +
      "(s3_to_json_s3.py:405-415, test_s3_to_json_s3.py:547-571)") {
    // the reference's ArchiveMetadata shape: items -> $ref -> definitions
    def schema(id: String) =
      s"""{"$$id": "$id",
           "type": "object",
           "definitions": {
             "FileInfo": {
               "$$id": "#FileInfo",
               "type": "object",
               "required": ["filename", "timestamp"],
               "properties": {"filename": {"type": "string"},
                              "timestamp": {"type": "string"}},
               "additionalProperties": false}},
           "required": ["appName", "files"],
           "properties": {
             "appName": {"type": "string"},
             "files": {"type": "array",
                       "items": {"$$ref": "#/definitions/FileInfo"}}}}"""
    val good =
      """{"appName": "mtb",
          "files": [{"filename": "a.json", "timestamp": "t"}]}"""
    val bad = // missing timestamp + an undeclared property in FileInfo
      """{"appName": "mtb", "files": [{"filename": "a.json", "extra": 1}]}"""
    val v2 = "https://example.org/schemas/v2/ArchiveMetadata.json"
    val v0 = "schemas/v0/ArchiveMetadata.json" // python-jsonschema bug 1012
    for (id <- Seq(v2, v0)) {
      assert(JsonSchemaValidator.validate(good, schema(id)).isEmpty,
        s"id=$id")
      val errs = JsonSchemaValidator.validate(bad, schema(id))
      assert(errs.toSet == Set(
        "'timestamp' is a required property",
        "Additional properties are not allowed ('extra' was unexpected)"),
        s"id=$id: $errs")
    }
    // $id-anchor form resolves to the same subschema
    val anchored = schema(v0).replace("#/definitions/FileInfo", "#FileInfo")
    assert(JsonSchemaValidator.validate(bad, anchored).size == 2)
    // external refs fail loudly instead of silently passing
    val external = schema(v2)
      .replace("#/definitions/FileInfo", "https://example.org/Other.json")
    intercept[IllegalArgumentException] {
      JsonSchemaValidator.validate(bad, external)
    }
    // $ref cycles fail fast rather than overflowing the stack
    intercept[IllegalArgumentException] {
      JsonSchemaValidator.validate("""{"a": 1}""", """{"$ref": "#"}""")
    }
  }

  test("V3: additionalProperties plural uses 'were'") {
    val errs = JsonSchemaValidator.validate("""{"a": 1, "b": 2, "c": 3}""",
      """{"properties": {"a": {}}, "additionalProperties": false}""")
    assert(errs ==
      Seq("Additional properties are not allowed ('b', 'c' were unexpected)"))
  }

  // ------------------------------------------------------------------
  // V4 — suppression matrix (tests/test_s3_to_json_s3.py:614-700)
  // ------------------------------------------------------------------

  private val android = "{osName:'Android'}"

  test("V4: empty errors pass through") {
    assert(ErrorSuppression.suppress(Map.empty, "mobile-toolbox", android).isEmpty)
  }

  test("V4: non-Android and non-mtb clients are not suppressed") {
    val errs = Map("metadata.json" -> Seq("'appName' is a required property"))
    assert(ErrorSuppression.suppress(errs, "mobile-toolbox", "{osName:'iOS'}") == errs)
    assert(ErrorSuppression.suppress(errs, "example-app", android) == errs)
  }

  test("V4: metadata.json allowlist suppresses to empty") {
    val errs = Map("metadata.json" -> Seq(
      "'appName' is a required property", "'files' is a required property"))
    assert(ErrorSuppression.suppress(errs, "mobile-toolbox", android).isEmpty)
  }

  test("V4: taskData.json / weather.json / motion.json allowlists") {
    assert(ErrorSuppression.suppress(
      Map("taskData.json" -> Seq(
        "Additional properties are not allowed ('type' was unexpected)")),
      "mobile-toolbox", android).isEmpty)
    assert(ErrorSuppression.suppress(
      Map("weather.json" -> Seq("'type' is a required property",
        "'type' is a required property")),
      "mobile-toolbox", android).isEmpty)
    assert(ErrorSuppression.suppress(
      Map("motion.json" -> ErrorSuppression.MotionAllowed),
      "mobile-toolbox", android).isEmpty)
  }

  test("V4: unexpected errors survive suppression, duplicates preserved") {
    val errs = Map("motion.json" -> Seq(
      "'stepPath' is a required property",
      "'weird' is a required property",
      "'weird' is a required property"))
    val out = ErrorSuppression.suppress(errs, "mobile-toolbox", android)
    assert(out == Map("motion.json" -> Seq(
      "'weird' is a required property", "'weird' is a required property")))
  }

  test("SO3: error cap keeps first 10 per file (s3_to_json_s3.py:814-818)") {
    val many = (1 to 25).map(i => s"err$i")
    val capped = ErrorSuppression.cap(Map("f.json" -> many))
    assert(capped("f.json") == many.take(10))
  }
}
