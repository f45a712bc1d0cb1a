package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    ("r1", "assessA", 2022, 9, 1, "hello"),
    ("r2", "assessA", 2022, 9, 2, "world"),
    ("r3", "assessB", 2023, 1, 15, "!"))
    .toDF("recordid", "assessmentid", "year", "month", "day", "payload")

  test("S3 sink produces the exact Hive layout " +
      "dataset=/assessmentid=/year=/month=/day= (s3_to_json_s3.py:628-639)") {
    val tmp = graft.EntryKit.scratchTracked("graft_sink").toString
    JsonDataset.write(sample, tmp, "WeatherResult_v1")
    val expect = Paths.get(tmp,
      "dataset=WeatherResult_v1", "assessmentid=assessA", "year=2022",
      "month=9", "day=1")
    assert(Files.isDirectory(expect), s"missing $expect")
    val files = Files.list(expect).iterator()
    var sawJson = false
    while (files.hasNext) {
      val f = files.next().getFileName.toString
      if (f.endsWith(".json")) sawJson = true
    }
    assert(sawJson, "no .json part files in leaf partition dir")
  }

  test("per-record sink writes exactly one {recordid}.ndjson per record " +
      "with the hidden-name 0-prefix rename (s3_to_json_s3.py:620-623)") {
    val tmp = graft.EntryKit.scratchTracked("graft_sinkpr").toString
    // _r4 starts with '_' (hidden to downstream scanners) → 0_r4.ndjson;
    // r2 is a multi-row record (the reference's JSON-array case)
    val df = Seq(
      ("r1", "assessA", 2022, 9, 1, "hello"),
      ("r2", "assessA", 2022, 9, 2, "item one"),
      ("r2", "assessA", 2022, 9, 2, "item two"),
      ("_r4", "assessB", 2023, 1, 15, "hidden"))
      .toDF("recordid", "assessmentid", "year", "month", "day", "payload")
    val nFiles = JsonDataset.writePerRecord(df, tmp, "ds")
    assert(nFiles == 3L)
    def leaf(a: String, y: Int, m: Int, d: Int) =
      Paths.get(tmp, "dataset=ds", s"assessmentid=$a", s"year=$y",
        s"month=$m", s"day=$d")
    assert(Files.exists(leaf("assessA", 2022, 9, 1).resolve("r1.ndjson")))
    assert(Files.exists(leaf("assessA", 2022, 9, 2).resolve("r2.ndjson")))
    assert(Files.exists(leaf("assessB", 2023, 1, 15).resolve("0_r4.ndjson")))
    assert(!Files.exists(leaf("assessB", 2023, 1, 15).resolve("_r4.ndjson")))
    // multi-row record: both rows in ITS one file, newline-delimited
    val r2 = new String(Files.readAllBytes(
      leaf("assessA", 2022, 9, 2).resolve("r2.ndjson")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(r2.linesIterator.size == 2 && r2.contains("item one") &&
      r2.contains("item two"))
    // the layout reads back as a normal JSON dataset, no rows lost
    val back = JsonDataset.read(spark, tmp, "ds",
      StructType.fromDDL("recordid string, payload string"))
    assert(back.count() == 4)
    assert(back.where($"recordid" === "_r4").count() == 1)
    // idempotent: a re-run overwrites in place, nothing doubles
    assert(JsonDataset.writePerRecord(df, tmp, "ds") == 3L)
    assert(JsonDataset.read(spark, tmp, "ds",
      StructType.fromDDL("recordid string, payload string")).count() == 4)
  }

  test("S2 read recovers rows + partition columns from the layout") {
    val tmp = graft.EntryKit.scratchTracked("graft_sink").toString
    JsonDataset.write(sample, tmp, "ds")
    val back = JsonDataset.read(spark, tmp, "ds",
      StructType.fromDDL("recordid string, payload string"))
    assert(back.count() == 3)
    assert(back.schema.fieldNames.toSet ==
      Set("recordid", "payload", "assessmentid", "year", "month", "day"))
    val r1 = back.where($"recordid" === "r1").collect().head
    assert(r1.getAs[String]("assessmentid") == "assessA")
    assert(r1.getAs[Int]("year") == 2022)
  }

  test("S4 parquet sink appends new partitions without clobbering") {
    val tmp = graft.EntryKit.scratchTracked("graft_sink").toString
    ParquetDataset.write(sample.where($"recordid" === "r1"), tmp)
    ParquetDataset.write(sample.where($"recordid" =!= "r1"), tmp)
    val back = ParquetDataset.read(spark, tmp)
    assert(back.count() == 3)
    // partition pruning: a single-partition read touches one directory
    val one = ParquetDataset.read(spark, tmp)
      .where($"assessmentid" === "assessB" && $"year" === 2023)
    assert(one.count() == 1)
  }

  test("compact rewrites ONLY over-full partitions; quiet partitions " +
      "keep their files untouched; rows survive exactly") {
    import org.apache.spark.sql.functions.{col, lit}
    val tmp = graft.EntryKit.scratchTracked("graft_cmp").toString
    def rows(a: String, n: Int) = (1 to n)
      .map(i => (s"$a-$i", a, 2023, 1, 1))
      .toDF("recordid", "assessmentid", "year", "month", "day")
    // partition a: three appends (over-full); partition b: one append
    (1 to 3).foreach(i => ParquetDataset.write(rows("a", 2), tmp))
    ParquetDataset.write(rows("b", 2), tmp)
    def filesOf(part: String) = spark.read.parquet(tmp)
      .inputFiles.filter(_.contains(s"assessmentid=$part")).sorted.toSeq
    val aBefore = filesOf("a"); val bBefore = filesOf("b")
    assert(aBefore.size == 3 && bBefore.size == 1)
    val beforeRows = spark.read.parquet(tmp).collect()
      .map(_.toString).sorted.toSeq

    val (parts, nFiles) = ParquetDataset.compact(
      spark, tmp, maxFilesPerPartition = 2)
    assert(parts == 1L && nFiles == 3L)
    // a collapsed to one file; b's file is the SAME file (no rewrite)
    assert(filesOf("a").size == 1)
    assert(filesOf("b") == bBefore)
    val afterRows = spark.read.parquet(tmp).collect()
      .map(_.toString).sorted.toSeq
    assert(afterRows == beforeRows)
    // idempotent: nothing left over the threshold
    assert(ParquetDataset.compact(spark, tmp, maxFilesPerPartition = 2)
      == ((0L, 0L)))
  }

  test("compact preserves directory names for numeric-looking string " +
      "partition values (no re-typed dir, no row duplication)") {
    val tmp = graft.EntryKit.scratchTracked("graft_cmp01").toString
    def rows(n: Int) = (1 to n).map(i => (s"r$i", "01"))
      .toDF("recordid", "assessmentid")
    (1 to 3).foreach(_ => ParquetDataset.write(rows(2), tmp,
      partitionCols = Seq("assessmentid")))
    assert(spark.read.parquet(tmp).count() == 6)
    val (parts, _) = ParquetDataset.compact(
      spark, tmp, partitionCols = Seq("assessmentid"), maxFilesPerPartition = 1)
    assert(parts == 1L)
    // the value "01" must NOT re-render through int inference into a new
    // assessmentid=1 directory (which would leave the old files in place
    // and double every row)
    assert(new java.io.File(s"$tmp/assessmentid=01").isDirectory)
    assert(!new java.io.File(s"$tmp/assessmentid=1").exists())
    assert(spark.read.parquet(tmp).count() == 6)
  }

  test("compact converges on partition values containing '+' (path " +
      "unescape is Hive %XX semantics, not URL decoding)") {
    // URLDecoder would turn "a+b" in the dir name into "a b", producing
    // a predicate matching nothing: the partition reports compacted but
    // its files never merge
    assert(ParquetDataset.unescapePathName("a+b") == "a+b")
    assert(ParquetDataset.unescapePathName("a%20b") == "a b")
    assert(ParquetDataset.unescapePathName("x%3Ay") == "x:y")
    assert(ParquetDataset.unescapePathName("50%") == "50%") // dangling %
    val tmp = graft.EntryKit.scratchTracked("graft_cmpplus").toString
    def rows(n: Int) = (1 to n).map(i => (s"r$i", "a+b"))
      .toDF("recordid", "assessmentid")
    (1 to 3).foreach(_ => ParquetDataset.write(rows(2), tmp,
      partitionCols = Seq("assessmentid")))
    val (parts, nFiles) = ParquetDataset.compact(
      spark, tmp, partitionCols = Seq("assessmentid"), maxFilesPerPartition = 1)
    assert(parts == 1L && nFiles == 3L)
    // actually converged: one file left, rows intact, second run a no-op
    assert(spark.read.parquet(tmp)
      .inputFiles.count(_.contains("assessmentid=")) == 1)
    assert(spark.read.parquet(tmp).count() == 6)
    assert(ParquetDataset.compact(spark, tmp,
      partitionCols = Seq("assessmentid"), maxFilesPerPartition = 1) == ((0L, 0L)))
  }

  test("upsert replaces keys, inserts new ones, leaves untouched " +
      "partitions byte-identical, and re-runs idempotently") {
    val tmp = graft.EntryKit.scratchTracked("graft_upsert").toString
    val base = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "c", 40.0))
      .toDF("k", "part", "v")
    ParquetDataset.write(base, tmp, partitionCols = Seq("part"))
    val filesC = spark.read.parquet(tmp).inputFiles
      .filter(_.contains("part=c")).sorted.toSeq
    // update key 1, insert key 5 — both land in partitions a/b only
    val updates = Seq((1L, "a", 11.0), (5L, "b", 50.0))
      .toDF("k", "part", "v")
    ParquetDataset.upsert(spark, tmp, updates,
      keyCols = Seq("k"), partitionCols = Seq("part"))
    def snap() = spark.read.parquet(tmp)
      .select($"k", $"part", $"v").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    val after = snap()
    assert(after == Seq((1L, "a", 11.0), (2L, "a", 20.0),
      (3L, "b", 30.0), (4L, "c", 40.0), (5L, "b", 50.0)))
    // partition c was absent from the updates: its files are untouched
    assert(spark.read.parquet(tmp).inputFiles
      .filter(_.contains("part=c")).sorted.toSeq == filesC)
    // idempotence: replaying the same updates changes nothing
    ParquetDataset.upsert(spark, tmp, updates,
      keyCols = Seq("k"), partitionCols = Seq("part"))
    assert(snap() == after)
  }

  test("P3 injection parses the reference uploadedon format (V5)") {
    val df = Seq(("2022-09-02T10:36:27.754Z", "a1", "r1"))
      .toDF("uploadedon", "aid", "rid")
    val out = JsonDataset.injectPartitions(df,
      $"uploadedon", $"aid", $"rid").collect().head
    assert(out.getAs[Int]("year") == 2022)
    assert(out.getAs[Int]("month") == 9)
    assert(out.getAs[Int]("day") == 2)
    assert(out.getAs[String]("recordid") == "r1")
  }

  test("ArchiveMetadata variant injects every metadata field " +
      "(s3_to_json_s3.py:598-604)") {
    val df = Seq(("r1", 1)).toDF("recordid", "x")
    val meta = Map(
      "healthcode" -> lit("hc-1"), "clientinfo" -> lit("{Android}"),
      "sessionguid" -> lit("g-1"))
    val out = JsonDataset.injectAllMetadata(df, meta)
    assert(out.schema.fieldNames.toSet ==
      Set("recordid", "x", "healthcode", "clientinfo", "sessionguid"))
    assert(out.collect().head.getAs[String]("healthcode") == "hc-1")
  }

  test("corrupt-record accounting: a type-drifted field is counted, " +
      "quarantined, and absent from the clean output " +
      "(json_s3_to_parquet.py:75-78 resolveChoice parity)") {
    val tmp = graft.EntryKit.scratchTracked("graft_acct").toString
    def leaf(a: String) = {
      val p = Paths.get(tmp, "dataset=acc", s"assessmentid=$a",
        "year=2023", "month=1", "day=1")
      Files.createDirectories(p)
      p
    }
    Files.write(leaf("A").resolve("part-0.json"), java.util.Arrays.asList(
      """{"doc_id": 1, "n_chars": 10}""",
      """{"doc_id": 2, "n_chars": "lots"}""", // upstream type drift
      """{"doc_id": 3"""))                    // not JSON at all
    Files.write(leaf("B").resolve("part-0.json"), java.util.Arrays.asList(
      """{"doc_id": 4, "n_chars": 40}"""))
    val scan = JsonDataset.readAccounted(spark, tmp, "acc",
      StructType.fromDDL("doc_id bigint, n_chars bigint"))

    // clean side: declared schema only, drifted/malformed rows ABSENT —
    // never silently nulled into the table
    assert(!scan.clean.schema.fieldNames.contains(JsonDataset.CorruptCol))
    val cleanIds = scan.clean.select("doc_id").as[Long].collect().toSet
    assert(cleanIds == Set(1L, 4L), s"clean ids: $cleanIds")

    // accounting: both bad rows counted, attributed to their partition
    val counts = JsonDataset.corruptCounts(scan.corrupt, Seq("assessmentid"))
      .as[(String, Long)].collect().toMap
    assert(counts == Map("A" -> 2L))

    // quarantine: raw lines survive verbatim for replay/inspection
    JsonDataset.quarantineCorrupt(scan.corrupt, s"$tmp/q", "acc")
    val quarantined = spark.read
      .schema(StructType.fromDDL("assessmentid string, raw string"))
      .json(s"$tmp/q/dataset=acc")
      .as[(String, String)].collect().toMap
    assert(quarantined.keySet == Set("A"))
    val raws = spark.read
      .schema(StructType.fromDDL("raw string")).json(s"$tmp/q/dataset=acc")
      .select("raw").as[String].collect().toSet
    assert(raws.exists(_.contains("\"lots\"")), "drifted line not quarantined")
    assert(raws.exists(_.startsWith("{\"doc_id\": 3")),
      "malformed line not quarantined")
    assert(raws.size == 2)
  }
}
