package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) source — the container every web-crawl
  * corpus ships in (Common Crawl publishes ~1 GB `.warc.gz` segment
  * files), and therefore the first mile of a crawl-derived training
  * pipeline: WARC scan → HTTP body → [[graft.text.Html]] extract →
  * [[graft.text.WebCuration]] / quality / dedup tiers.
  *
  * Format recap (self-describing, no external schema): a file is a
  * sequence of records, each `WARC/1.0\r\n` + named headers + blank
  * line + exactly `Content-Length` payload bytes + `\r\n\r\n`. In the
  * `.gz` form each record is its own gzip member and members are
  * concatenated — `GZIPInputStream` walks multi-member streams
  * natively, so one sequential decode per file covers both layouts.
  *
  * Scale shape: gzip members carry no sync marker, so a WARC file is
  * NOT block-splittable without a sidecar index — the unit of
  * parallelism is the FILE, which is exactly how the corpus is sharded
  * upstream (Common Crawl: ~72k files/crawl). The scan is
  * `binaryFile` rows → per-task sequential parse, no shuffle; filters
  * and projections on the parsed columns stay in the same stage.
  *
  * Corrupt posture (matches the quarantine discipline of the other
  * sources): a structurally-broken record poisons the REST of its file
  * (record framing is byte-offset arithmetic — nothing downstream of a
  * bad length can be trusted), so parsing stops there and one
  * `warc_type = "__corrupt"` row records the error and record index;
  * records before the fault are kept. Nothing throws on data.
  *
  * HTTP response records (`Content-Type: application/http…`) also get
  * their payload split at the header/body boundary: `http_status`,
  * `http_content_type`, and `payload` = the BODY bytes. Non-HTTP
  * records carry the whole block as `payload`.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("record_idx", IntegerType),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("payload", BinaryType),
    StructField("error", StringType)))

  /** Parse every WARC record under `path` (a file, directory, or glob;
    * `.gz` names are gunzipped first). One output row per record, plus
    * at most one `__corrupt` row per structurally-broken file.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    fromBinary(spark.read.format("binaryFile").load(path))

  /** The binary→records transform on an already-loaded `binaryFile`
    * frame (columns `path`, `content`) — batch or STREAMING: the same
    * per-task parse rides a `readStream.format("binaryFile")` source,
    * which is how an arriving crawl drop ingests incrementally (each
    * micro-batch sees only files the source hasn't committed yet).
    */
  def fromBinary(binary: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(schema)
    binary.select("path", "content")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val name = r.getString(0)
          parse(name, r.getAs[Array[Byte]](1))
        }
      }(enc)
  }

  /** All records of one file's bytes — exposed for spec-level use. */
  def parse(file: String, raw: Array[Byte]): Seq[Row] = {
    val bytes =
      if (!file.endsWith(".gz")) raw
      else
        try gunzipAll(raw)
        catch {
          case e: Exception =>
            return Seq(corruptRow(file, 0, s"gzip: ${e.getMessage}"))
        }
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var pos = 0
    var idx = 0
    var dead = false
    while (!dead && {
        // skip inter-record blank lines
        while (pos < bytes.length &&
            (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
        pos < bytes.length
      }) {
      parseRecord(bytes, pos) match {
        case Right((headers, blockStart, blockLen, next)) =>
          out += recordRow(file, idx, headers, bytes, blockStart, blockLen)
          pos = next
          idx += 1
        case Left(err) =>
          out += corruptRow(file, idx, err)
          dead = true
      }
    }
    out.toSeq
  }

  // ---- record framing ------------------------------------------------

  /** From `pos` (first byte of the version line): Right((headers,
    * blockStart, blockLen, nextRecordPos)) or Left(error).
    */
  private def parseRecord(bytes: Array[Byte], pos0: Int)
      : Either[String, (Map[String, String], Int, Int, Int)] = {
    var pos = pos0
    val (version, p1) = readLine(bytes, pos)
    if (!version.startsWith("WARC/"))
      return Left(s"expected WARC/ version line at byte $pos0, got " +
        s"'${version.take(32)}'")
    pos = p1
    val headers = scala.collection.mutable.Map.empty[String, String]
    var blank = false
    while (!blank) {
      if (pos >= bytes.length)
        return Left("EOF inside header block")
      val (line, p) = readLine(bytes, pos)
      pos = p
      if (line.isEmpty) blank = true
      else {
        val i = line.indexOf(':')
        if (i < 0) return Left(s"malformed header line '${line.take(32)}'")
        headers(line.substring(0, i).trim.toLowerCase) =
          line.substring(i + 1).trim
      }
    }
    val len = headers.get("content-length").flatMap(_.toLongOption)
      .getOrElse(return Left("missing or non-numeric Content-Length"))
    if (len < 0 || pos + len > bytes.length)
      return Left(s"Content-Length $len overruns file (at byte $pos)")
    Right((headers.toMap, pos, len.toInt, pos + len.toInt))
  }

  /** Line at `pos` up to CRLF (or bare LF, tolerated): (text, nextPos). */
  private def readLine(bytes: Array[Byte], pos: Int): (String, Int) = {
    var i = pos
    while (i < bytes.length && bytes(i) != '\n') i += 1
    val end = if (i > pos && bytes(i - 1) == '\r') i - 1 else i
    (new String(bytes, pos, end - pos, UTF_8),
      math.min(i + 1, bytes.length))
  }

  private def recordRow(file: String, idx: Int, h: Map[String, String],
      bytes: Array[Byte], blockStart: Int, blockLen: Int): Row = {
    val contentType = h.get("content-type").orNull
    val isHttp = contentType != null &&
      contentType.toLowerCase.startsWith("application/http")
    val (status, httpCt, payload) =
      if (!isHttp)
        (null, null, java.util.Arrays.copyOfRange(
          bytes, blockStart, blockStart + blockLen))
      else splitHttp(bytes, blockStart, blockLen)
    Row(file, idx, h.get("warc-type").orNull, h.get("warc-record-id").orNull,
      h.get("warc-target-uri").orNull, h.get("warc-date").orNull,
      contentType, blockLen.toLong, status, httpCt, payload, null)
  }

  /** HTTP block → (status, content-type, body bytes). A block with no
    * header/body boundary keeps everything as the body (status null) —
    * a tolerated-malformation, not a record fault.
    */
  private def splitHttp(bytes: Array[Byte], start: Int, len: Int)
      : (Integer, String, Array[Byte]) = {
    var i = start
    val end = start + len
    var split = -1
    while (split < 0 && i + 3 < end) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') split = i
      else i += 1
    }
    if (split < 0)
      return (null, null, java.util.Arrays.copyOfRange(bytes, start, end))
    val head = new String(bytes, start, split - start, UTF_8)
    val lines = head.split("\r\n")
    val status: Integer = lines.headOption
      .map(_.split(" ")).filter(_.length >= 2)
      .flatMap(t => t(1).toIntOption).map(Integer.valueOf).orNull
    val ct = lines.drop(1)
      .find(_.toLowerCase.startsWith("content-type:"))
      .map(l => l.substring(l.indexOf(':') + 1).trim).orNull
    (status, ct, java.util.Arrays.copyOfRange(bytes, split + 4, end))
  }

  private def corruptRow(file: String, idx: Int, err: String): Row =
    Row(file, idx, "__corrupt", null, null, null, null, null, null, null,
      null, err)

  private def gunzipAll(raw: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(raw))
    val out = new ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  // ---- writer (fixtures + round-trip tests; also the honest way to
  // emit WARC from the engine) ----------------------------------------

  /** Serialize one HTTP-response record (status 200, text/plain body). */
  def httpResponseRecord(uri: String, date: String, recordId: String,
      body: Array[Byte]): Array[Byte] = {
    val http = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/plain; charset=utf-8\r\n\r\n").getBytes(UTF_8)
    val block = http ++ body
    (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: $recordId\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes(UTF_8) ++
      block ++ "\r\n\r\n".getBytes(UTF_8)
  }

  /** Serialize a warcinfo record (the per-file preamble real crawls
    * carry).
    */
  def warcinfoRecord(date: String, info: String): Array[Byte] = {
    val block = info.getBytes(UTF_8)
    (s"WARC/1.0\r\n" +
      s"WARC-Type: warcinfo\r\n" +
      s"WARC-Date: $date\r\n" +
      s"Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes(UTF_8) ++
      block ++ "\r\n\r\n".getBytes(UTF_8)
  }
}
