package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    graft.EntryKit.scratchTracked("graft_tar_test").toString

  test("ustar writeEntry produces a header a standard parser accepts") {
    val out = new ByteArrayOutputStream()
    TarShards.writeEntry(out, "k0.txt", "hello".getBytes(StandardCharsets.UTF_8))
    out.write(new Array[Byte](1024))
    val b = out.toByteArray
    // header fields at their POSIX offsets
    assert(new String(b, 0, 6, StandardCharsets.UTF_8) == "k0.txt")
    assert(new String(b, 257, 5) == "ustar")
    assert(new String(b, 124, 11) == "00000000005") // size 5, octal
    // checksum: sum of header bytes with the chksum field as spaces
    val h = java.util.Arrays.copyOf(b, 512)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val expect = h.map(_ & 0xff).sum
    val stored = Integer.parseInt(new String(b, 148, 6), 8)
    assert(stored == expect)
    // payload starts at 512, zero-padded to the next block
    assert(new String(b, 512, 5, StandardCharsets.UTF_8) == "hello")
    assert(b(517) == 0)
  }

  test("parse round-trips writeEntry output including empty payloads") {
    val out = new ByteArrayOutputStream()
    TarShards.writeEntry(out, "a.txt", "alpha".getBytes)
    TarShards.writeEntry(out, "a.cls", Array.emptyByteArray)
    TarShards.writeEntry(out, "b.txt", ("x" * 513).getBytes) // spans blocks
    out.write(new Array[Byte](1024))
    val got = TarShards.parse(out.toByteArray).toList
    assert(got.map(_._1) == List("a.txt", "a.cls", "b.txt"))
    assert(new String(got.head._2) == "alpha")
    assert(got(1)._2.isEmpty)
    assert(got(2)._2.length == 513)
  }

  test("shard write → read round-trips every member; members of one key adjacent") {
    val dir = tmpDir()
    val df = (0 until 200).map(i => (s"k$i", s"text $i", s"lab${i % 3}"))
      .toDF("key", "text", "label")
    val shards = TarShards.write(df, dir, "key",
      Seq("text" -> "txt", "label" -> "cls"), numShards = 4)
    assert(shards > 0 && shards <= 4)
    val back = TarShards.read(spark, dir)
    assert(back.count() == 400)
    val texts = back.filter(_.ext == "txt")
      .map(m => m.key -> new String(m.data, StandardCharsets.UTF_8))
      .collect().toMap
    assert(texts.size == 200 && texts("k7") == "text 7")
    // adjacency: within each shard, the two members of a key are
    // consecutive entries (loaders depend on this to group without
    // buffering)
    val parsed = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar"))
      .flatMap(f => TarShards.parse(Files.readAllBytes(f.toPath)).map(_._1))
    parsed.grouped(2).foreach { case Array(a, b) =>
      assert(a.stripSuffix(".txt").stripSuffix(".cls") ==
        b.stripSuffix(".txt").stripSuffix(".cls"))
    }
  }

  test("shard bytes are a pure function of content (reproducible rebuild)") {
    val df = (0 until 50).map(i => (s"k$i", s"payload $i")).toDF("key", "text")
    val d1 = tmpDir(); val d2 = tmpDir()
    // different upstream partitioning must not change shard bytes
    TarShards.write(df.repartition(7), d1, "key", Seq("text" -> "txt"), 3)
    TarShards.write(df.coalesce(1), d2, "key", Seq("text" -> "txt"), 3)
    val f1 = new java.io.File(d1).listFiles().filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    val f2 = new java.io.File(d2).listFiles().filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    assert(f1.map(_.getName).toSeq == f2.map(_.getName).toSeq)
    f1.zip(f2).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(a.toPath), Files.readAllBytes(b.toPath)))
    }
  }

  test("readRecords regroups members into ext→bytes maps") {
    val dir = tmpDir()
    val df = Seq(("a", "ta", "1"), ("b", "tb", "2")).toDF("key", "text", "label")
    TarShards.write(df, dir, "key", Seq("text" -> "txt", "label" -> "cls"), 2)
    val recs = TarShards.readRecords(spark, dir)
      .select(col("key"), expr("cast(members['txt'] as string)").as("t"),
        expr("cast(members['cls'] as string)").as("l"))
      .as[(String, String, String)].collect()
      .map { case (k, t, l) => k -> (t, l) }.toMap
    assert(recs == Map("a" -> ("ta", "1"), "b" -> ("tb", "2")))
  }

  test("member names over 100 bytes fail fast") {
    val out = new ByteArrayOutputStream()
    intercept[IllegalArgumentException] {
      TarShards.writeEntry(out, "k" * 101, Array.emptyByteArray)
    }
  }

  test("null payload writes an empty member") {
    val dir = tmpDir()
    val df = Seq(("a", "ta"), ("b", null)).toDF("key", "text")
    TarShards.write(df, dir, "key", Seq("text" -> "txt"), 1)
    val back = TarShards.read(spark, dir).collect()
    assert(back.length == 2)
    assert(back.find(_.key == "b").get.data.isEmpty)
  }

  test("shuffled write orders members by md5(key) — decorrelated but " +
      "deterministic, same content either way") {
    import spark.implicits._
    val rows = (0 until 40).map(i => (f"k$i%03d", s"payload$i"))
    val df = rows.toDF("key", "text")
    val plain = tmpDir(); val shuf = tmpDir(); val shuf2 = tmpDir()
    TarShards.write(df, plain, "key", Seq("text" -> "txt"), 1)
    TarShards.write(df, shuf, "key", Seq("text" -> "txt"), 1,
      shuffled = true)
    TarShards.write(df, shuf2, "key", Seq("text" -> "txt"), 1,
      shuffled = true)
    def order(dir: String): Seq[String] =
      TarShards.read(spark, dir).collect().map(_.key).toSeq
    val p = order(plain); val s1 = order(shuf); val s2 = order(shuf2)
    assert(p == p.sorted, "plain write is key-ordered")
    assert(s1.sorted == p.sorted, "same members either way")
    assert(s1 != p, "shuffled order must differ from key order")
    assert(s1 == s2, "shuffle is deterministic across re-runs")
    val wantOrder = rows.map(_._1).sortBy(k =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString, k))
    assert(s1 == wantOrder, "order is exactly the md5 rank")
  }
}
