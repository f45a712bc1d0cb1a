package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The compressed-video bridge is environment-dependent by design: with
  * no ffmpeg on PATH it must degrade to zero rows / "unknown" metadata
  * (quarantine posture, never throw); with ffmpeg present it must
  * round-trip real frames through the Y4M demux path. Both branches are
  * guarded here so the suite is green either way and the present-branch
  * tests light up automatically on a host that has the binary.
  */
class FfmpegVideoSpec extends SparkSpec {
  import spark.implicits._

  private def blobs = Seq(
    // a real Y4M blob: valid input to ffmpeg (it demuxes Y4M too), and
    // a deterministic frame count for the present-branch assertion
    (1L, Multimodal.encodeY4mMono(4, 2, 3, (f, k) => f * 10 + k)),
    (2L, "definitely not a video".getBytes("UTF-8"))
  ).toDF("id", "content")

  test("binary discovery never throws and GRAFT_FFMPEG shape is honored") {
    // just force the lazy val; both outcomes are legal
    val _ = FfmpegVideo.isAvailable
  }

  test("transcode of garbage bytes is None, not an exception") {
    // true on both branches: absent binary short-circuits, present
    // binary fails the decode — either way None, never a throw
    assert(FfmpegVideo.transcodeToY4m("garbage".getBytes("UTF-8")).isEmpty)
  }

  if (!FfmpegVideo.isAvailable) {
    test("absent binary: frameSampleCompressed yields zero rows, no throw") {
      assert(FfmpegVideo.frameSampleCompressed(blobs, "id", "content", 1).count() == 0L)
    }
    test("absent binary: decodeCompressedMeta quarantines every blob as unknown") {
      val m = FfmpegVideo.decodeCompressedMeta(blobs, "id", "content")
      assert(m.count() == 2L)
      assert(m.where(col("format") === "unknown").count() == 2L)
    }
  } else {
    test("present binary: Y4M round-trips with exact frame count") {
      val got = FfmpegVideo.demuxCompressed(
        Multimodal.encodeY4mMono(4, 2, 3, (f, k) => f * 10 + k))
      assert(got.nonEmpty)
      assert(got.get._1.nFrames == 3)
    }
    test("present binary: frameSampleCompressed emits the child-table shape") {
      val rows = FfmpegVideo.frameSampleCompressed(blobs, "id", "content", 2)
      assert(rows.columns.toSeq == Seq("id", "frame_idx", "frame"))
      // blob 1 has 3 frames → indices 0 and 2 survive everyN=2
      assert(rows.where(col("id") === 1L).count() == 2L)
      assert(rows.where(col("id") === 2L).count() == 0L)
    }
  }
}
