package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val date = "2026-01-01T00:00:00Z"

  private def response(i: Int): Array[Byte] =
    Warc.httpResponseRecord(s"http://example.com/doc/$i", date,
      s"<urn:uuid:rec-$i>", s"body of document $i".getBytes(UTF_8))

  private def fileBytes(n: Int): Array[Byte] =
    (Warc.warcinfoRecord(date, "software: graft-test\r\n") +:
      (0 until n).map(response)).reduce(_ ++ _)

  private def gzMembers(records: Seq[Array[Byte]]): Array[Byte] = {
    // one gzip MEMBER per record, concatenated — the Common Crawl layout
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val g = new GZIPOutputStream(out)
      g.write(r)
      g.finish()
    }
    out.toByteArray
  }

  test("plain .warc round-trip: every header field, payload split, and " +
      "record order survive") {
    val rows = Warc.parse("f.warc", fileBytes(3))
    assert(rows.length == 4)
    val info = rows.head
    assert(info.getString(2) == "warcinfo")
    assert(info.getString(6) == "application/warc-fields")
    // non-HTTP record: whole block is the payload, no status
    assert(new String(info.getAs[Array[Byte]](10), UTF_8) ==
      "software: graft-test\r\n")
    assert(info.get(8) == null)
    rows.tail.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(1) == i + 1)
      assert(r.getString(2) == "response")
      assert(r.getString(3) == s"<urn:uuid:rec-$i>")
      assert(r.getString(4) == s"http://example.com/doc/$i")
      assert(r.getString(5) == date)
      assert(r.getInt(8) == 200)
      assert(r.getString(9) == "text/plain; charset=utf-8")
      assert(new String(r.getAs[Array[Byte]](10), UTF_8) ==
        s"body of document $i")
      assert(r.get(11) == null)
    }
  }

  test("multi-member .warc.gz parses through the distributed reader " +
      "with per-file parallelism") {
    val dir = graft.EntryKit.scratchTracked("warc_gz").toString
    (0 until 3).foreach { f =>
      val recs = Warc.warcinfoRecord(date, s"file: $f\r\n") +:
        (0 until 4).map(i => response(f * 10 + i))
      val fos = new FileOutputStream(s"$dir/seg-$f.warc.gz")
      fos.write(gzMembers(recs))
      fos.close()
    }
    val df = Warc.read(spark, s"$dir/*.warc.gz")
    assert(df.count() == 15)
    assert(df.where(col("warc_type") === "response").count() == 12)
    assert(df.where(col("warc_type") === "__corrupt").count() == 0)
    val uris = df.where(col("warc_type") === "response")
      .select("target_uri").collect().map(_.getString(0)).toSet
    assert(uris == (for (f <- 0 until 3; i <- 0 until 4)
      yield s"http://example.com/doc/${f * 10 + i}").toSet)
  }

  test("a structurally-broken record keeps its predecessors, yields one " +
      "__corrupt row, and poisons the rest of the file") {
    val good = response(0) ++ response(1)
    val bad = "NOT-A-WARC-RECORD\r\n\r\n".getBytes(UTF_8)
    val rows = Warc.parse("f.warc", good ++ bad ++ response(2))
    assert(rows.length == 3)
    assert(rows.take(2).forall(_.getString(2) == "response"))
    assert(rows(2).getString(2) == "__corrupt")
    assert(rows(2).getString(11).contains("expected WARC/"))
  }

  test("a Content-Length overrunning the file is a record fault, not a " +
      "mis-sliced payload") {
    val rec = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "Content-Length: 999999\r\n\r\nshort").getBytes(UTF_8)
    val rows = Warc.parse("f.warc", response(0) ++ rec)
    assert(rows.length == 2)
    assert(rows(1).getString(2) == "__corrupt")
    assert(rows(1).getString(11).contains("overruns"))
  }

  test("an HTTP block without a header/body boundary is tolerated: " +
      "whole block as body, null status") {
    val block = "HTTP/1.1 200 OK\r\nno terminating blank line".getBytes(UTF_8)
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes(UTF_8) ++
      block ++ "\r\n\r\n".getBytes(UTF_8)
    val rows = Warc.parse("f.warc", rec)
    assert(rows.length == 1)
    assert(rows.head.get(8) == null)
    assert(rows.head.getAs[Array[Byte]](10).sameElements(block))
  }

  test("bare-LF header lines are tolerated (lenient framing)") {
    val body = "x".getBytes(UTF_8)
    val rec = ("WARC/1.0\nWARC-Type: resource\n" +
      s"Content-Length: ${body.length}\n\n").getBytes(UTF_8) ++
      body ++ "\n\n".getBytes(UTF_8)
    val rows = Warc.parse("f.warc", rec)
    assert(rows.length == 1)
    assert(rows.head.getString(2) == "resource")
    assert(rows.head.getAs[Array[Byte]](10).sameElements(body))
  }

  test("a garbage gz file quarantines instead of throwing") {
    val rows = Warc.parse("f.warc.gz", Array[Byte](1, 2, 3, 4))
    assert(rows.length == 1)
    assert(rows.head.getString(2) == "__corrupt")
    assert(rows.head.getString(11).startsWith("gzip:"))
  }
}
