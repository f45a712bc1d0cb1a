package graft.ingest

import graft.SparkSpec
import graft.relationalize.Relationalize
import graft.schema.TableCatalog
import graft.sources.{JsonDataset, ParquetDataset}
import graft.validate.{ArchiveMap, SchemaCache}

import java.nio.file.{Files, Paths}

/** End-to-end stage-1 + stage-2 slice over the reference fixture archive
  * (tests/data/OCJByUtSrVTYtqObYp7XZV_J-mtbSpelling.zip): ZIP → validate →
  * route → partitioned NDJSON → schema-applied read → relationalize →
  * partitioned Parquet, with count/FK parity (SURVEY §7 minimum slice).
  */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val fixtureZip =
    "/root/reference/tests/data/OCJByUtSrVTYtqObYp7XZV_J-mtbSpelling.zip"

  private def record = RawRecord(
    metadata = Map(
      "recordid" -> "OCJByUtSrVTYtqObYp7XZV",
      "assessmentid" -> "spelling",
      "assessmentrevision" -> "4",
      "uploadedon" -> "2022-02-15T20:47:36.270Z",
      "clientinfo" -> "{osName:'iOS'}",
      "healthcode" -> "health-1"),
    zipBytes = Files.readAllBytes(Paths.get(fixtureZip)))

  private def cfg = IngestJob.Config(
    archiveMap = ArchiveMap(Nil, Nil, Nil),
    schemas = new SchemaCache(_ => "{}"),
    schemaMapping = Router.defaultSchemaMapping,
    datasetMapping = Router.defaultDatasetMapping)

  test("legacy-mapped assessments skip validation (validate_data)") {
    assert(IngestJob.validateRecord(record, cfg).isEmpty)
  }

  test("routing: mapped members route, unmapped members are skipped " +
      "(process_record)") {
    val lines = IngestJob.routeRecord(record, cfg)
    val datasets = lines.map(_.dataset).toSet
    // spelling rev 4 maps metadata/motion/taskData/weather only —
    // info.json, microphone*, taskResult.json, bare taskData are skipped
    assert(datasets == Set(
      "TaskMetadata_v1", "MotionRecord_v1", "sharedSchema_v1",
      "WeatherResult_v1"))
    assert(lines.forall(_.recordid == "OCJByUtSrVTYtqObYp7XZV"))
    assert(lines.forall(l => l.year == 2022 && l.month == 2 && l.day == 15))
    // metadata dataset gets the full S3 metadata injected
    val meta = lines.find(_.dataset == "TaskMetadata_v1").get
    assert(meta.line.contains("\"healthcode\":\"health-1\""))
    // non-metadata datasets only get the partition fields + recordid
    val weather = lines.find(_.dataset == "WeatherResult_v1").get
    assert(!weather.line.contains("healthcode"))
    assert(weather.line.contains("\"recordid\":\"OCJByUtSrVTYtqObYp7XZV\""))
  }

  test("E2E: zip -> NDJSON layout -> schema-applied read -> relationalize " +
      "-> partitioned parquet with FK/count parity") {
    val tmp = graft.EntryKit.scratchTracked("graft_e2e").toString
    val jsonRoot = s"$tmp/raw_json"
    val parquetRoot = s"$tmp/parquet"
    val records = spark.createDataset(Seq(record))
    val (valid, invalid) = IngestJob.run(
      spark, records, cfg, jsonRoot, s"$tmp/quarantine")
    assert(invalid.isEmpty)
    // 4 datasets; motion.json is a 4-element top-level array normalized to
    // one NDJSON line per element (the array_of_records `$[*]` classifier
    // behavior) → 1 + 1 + 1 + 4 = 7 lines
    assert(valid.count() == 7)
    assert(valid.where($"dataset" === "MotionRecord_v1").count() == 4)

    // exact layout (s3_to_json_s3.py:628-639)
    assert(Files.isDirectory(Paths.get(jsonRoot,
      "dataset=WeatherResult_v1", "assessmentid=spelling",
      "year=2022", "month=2", "day=15")))

    // stage 2: schema-applied read of the weather dataset
    val spec = TableCatalog.default("WeatherResult_v1")
    val weather = JsonDataset.read(
      spark, jsonRoot, "WeatherResult_v1", spec.schema)
      .withColumn("recordid", $"recordid")
    assert(weather.count() == 1)
    assert(Relationalize.hasNestedFields(weather.schema))

    // relationalize + partitioned parquet write of every table
    val tables = Relationalize.relationalize(
      weather, "WeatherResult_v1", keyCols = Seq("recordid"),
      carryCols = Seq("assessmentid", "year", "month", "day", "recordid"))
    tables.foreach { case (name, df) =>
      ParquetDataset.write(df, s"$parquetRoot/$name")
    }
    val root = ParquetDataset.read(spark, s"$parquetRoot/WeatherResult_v1")
    assert(root.count() == 1)
    assert(root.select("recordid").as[String].head() == "OCJByUtSrVTYtqObYp7XZV")
    // count-distinct recordid parity across json and parquet (etl-245)
    val jsonIds = weather.select("recordid").distinct().count()
    val pqIds = root.select("recordid").distinct().count()
    assert(jsonIds == pqIds)
  }

  test("staging retention: previous generation survives by default, " +
      "is reclaimed under the TTL valve, older ones always go") {
    val tmp = graft.EntryKit.scratchTracked("graft_stage").toString
    val jsonRoot = s"$tmp/raw_json"
    def stagingDirs(): Seq[String] = {
      val f = new java.io.File(s"$jsonRoot/_staging")
      if (!f.isDirectory) Nil
      else f.listFiles().filter(_.isDirectory).map(_.getName).toSeq
    }
    def run() = IngestJob.run(spark, spark.createDataset(Seq(record)), cfg,
      jsonRoot, s"$tmp/quarantine")._1.count()

    run()
    assert(stagingDirs().size == 1)
    // default: the previous generation stays readable through the next run
    run()
    assert(stagingDirs().size == 2)
    // and the one before THAT is always reclaimed
    run()
    assert(stagingDirs().size == 2)
    // TTL valve: 0 seconds — the previous generation is reclaimed
    // immediately, bounding the envelope to one generation
    try {
      spark.conf.set("spark.graft.ingest.staging.ttlSeconds", "0")
      run()
      assert(stagingDirs().size == 1)
      // a generous TTL keeps the previous generation (not yet expired)
      spark.conf.set("spark.graft.ingest.staging.ttlSeconds", "3600")
      run()
      assert(stagingDirs().size == 2)
    } finally spark.conf.unset("spark.graft.ingest.staging.ttlSeconds")
  }

  test("S8: file listing enumerates the written NDJSON dataset") {
    val tmp = graft.EntryKit.scratchTracked("graft_e2e").toString
    val jsonRoot = s"$tmp/raw_json"
    IngestJob.run(spark, spark.createDataset(Seq(record)), cfg,
      jsonRoot, s"$tmp/quarantine")
    val listed = FileListing.list(spark, jsonRoot)
      .where(!$"path".contains("_SUCCESS"))
    assert(listed.count() >= 4)
    assert(listed.where($"path".contains("dataset=MotionRecord_v1")).count() >= 1)
  }

  test("S1: ZipSource enumerates fixture members distributively") {
    val tmp = graft.EntryKit.scratchTracked("graft_zip").toString
    Files.copy(Paths.get(fixtureZip), Paths.get(tmp, "a.zip"))
    val entries = ZipSource.read(spark, s"$tmp/*.zip").collect()
    assert(entries.length == 9)
    assert(entries.map(_.entryName).toSet.contains("weather.json"))
  }

  test("P6: microphone.json normalizes to microphone_levels.json") {
    assert(Router.normalizeFileName("microphone.json") == "microphone_levels.json")
    assert(Router.normalizeFileName("sub/dir/motion.json") == "motion.json")
  }
}
