package graft.multimodal

import graft.SparkSpec
import java.nio.charset.StandardCharsets

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def blob(id: Long, w: Int, h: Int, f: Int, payload: String) =
    (id, s"GRFT|img|$w|$h|$f|$payload".getBytes(StandardCharsets.UTF_8))

  private def df = Seq(
    blob(1L, 64, 48, 2, "0123456789"),
    blob(2L, 128, 96, 3, "abcdefg"),
    (3L, "not a media file".getBytes(StandardCharsets.UTF_8)))
    .toDF("doc_id", "content")

  test("decodeStub parses the header; malformed input degrades safely") {
    val m = Multimodal.decodeStub(blob(0L, 64, 48, 2, "0123456789")._2)
    assert(m == Multimodal.MediaMeta("img", 64, 48, 2, 10))
    val bad = Multimodal.decodeStub("garbage".getBytes)
    assert(bad.format == "unknown" && bad.payloadLen == 7)
  }

  test("decodeMeta emits typed metadata columns per blob") {
    val out = Multimodal.decodeMeta(df, "doc_id", "content")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("width") == 64)
    assert(out(1).getAs[Int]("n_frames") == 3)
    assert(out(2).getAs[String]("format") == "unknown")
  }

  test("frameSample splits payload into chunks, keeps every Nth, " +
      "remainder goes to the last frame") {
    val frames = Multimodal.frameSample(df, "doc_id", "content", everyN = 1)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        new String(r.getAs[Array[Byte]]("frame"), StandardCharsets.UTF_8)))
    val doc1 = frames.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(doc1.toSeq == Seq("01234", "56789"))
    val doc2 = frames.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    assert(doc2.toSeq == Seq("ab", "cd", "efg")) // 7 bytes over 3 frames
    // malformed blob yields no frames (quarantined upstream, not a crash)
    assert(!frames.exists(_._1 == 3L))
  }

  test("resize nearest-neighbor-samples the payload to the target grid") {
    val out = Multimodal.resize(df, "doc_id", "content", outW = 2, outH = 2)
      .collect()
      .map(r => (r.getLong(0),
        new String(r.getAs[Array[Byte]]("resized"), StandardCharsets.UTF_8)))
      .toMap
    // payload "0123456789": k·10/4 for k=0..3 → indices 0,2,5,7
    assert(out(1L) == "0257")
    // payload "abcdefg": k·7/4 → indices 0,1,3,5
    assert(out(2L) == "abdf")
    // malformed blob (payloadLen from fallback) still samples its bytes
    assert(out(3L).length == 4)
    val dims = Multimodal.resize(df, "doc_id", "content", 2, 2)
      .select("width", "height").distinct().as[(Int, Int)].collect().toSeq
    assert(dims == Seq((2, 2)))
  }

  test("featurize yields a fixed-size L1-normalized vector") {
    val feats = Multimodal.featurize(df, "doc_id", "content")
      .where($"doc_id" === 1L)
      .select("features").as[Seq[Double]].head()
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0) < 1e-12)
  }
}
