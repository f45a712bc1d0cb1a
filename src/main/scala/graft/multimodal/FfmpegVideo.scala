package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.io.{File, IOException}
import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal

/** Optional external-binary bridge for COMPRESSED video (H.264/VP9/…),
  * the one multimodal format tier with no JVM decoder
  * (cf. `/root/reference` parity scope: video rides as opaque payload).
  *
  * Design: ffmpeg is used ONLY as a transcoder to Y4M — one subprocess
  * per blob, `pipe:0` → `-f yuv4mpegpipe` → `pipe:1` — and everything
  * downstream reuses the existing byte-exact [[Multimodal.demuxY4m]]
  * path, so the compressed tier exposes the SAME
  * `(id, content) → (id, frame_idx, frame)` child-table shape as the
  * uncompressed one. No new frame-walk logic exists on this path; the
  * bridge is pure plumbing and disappears when the binary is absent.
  *
  * Availability is probed once per JVM (executor-local, so each executor
  * probes its own PATH — correct on a heterogeneous cluster). When the
  * binary is missing every decode yields None and the operators produce
  * zero rows for compressed blobs instead of throwing: the quarantine
  * posture of the rest of the codec tier (`decodeVideoMeta` routes
  * undecodables). Override discovery with the `GRAFT_FFMPEG` env var.
  *
  * Scale: blobs stream through the subprocess with a drain thread on
  * stdin (classic pipe-deadlock guard); memory per task is one input
  * blob + one Y4M output. Frame sampling on 100 TB of compressed video
  * would decode-then-drop (ffmpeg cannot skip-decode arbitrary codecs
  * safely), so the everyN filter applies post-demux like the Y4M path.
  */
object FfmpegVideo {

  /** Resolve the ffmpeg binary: GRAFT_FFMPEG override, else PATH scan.
    * Lazily memoized per JVM.
    */
  lazy val binary: Option[String] = {
    val candidates = sys.env.get("GRAFT_FFMPEG").toSeq ++
      sys.env.getOrElse("PATH", "").split(File.pathSeparatorChar).toSeq
        .filter(_.nonEmpty).map(d => s"$d${File.separatorChar}ffmpeg")
    candidates.find { p =>
      try { val f = Paths.get(p); Files.isRegularFile(f) && Files.isExecutable(f) }
      catch { case NonFatal(_) => false }
    }
  }

  def isAvailable: Boolean = binary.isDefined

  /** Hard ceiling on one blob's transcode. A pathological blob that
    * makes ffmpeg hang must yield None like every other failure — an
    * unbounded wait would turn the quarantine posture into a
    * permanently stuck task.
    */
  val TranscodeTimeoutSeconds = 120L

  /** Transcode one compressed-container blob to Y4M bytes via ffmpeg.
    * None when the binary is absent, the blob is undecodable, the
    * subprocess fails, or the [[TranscodeTimeoutSeconds]] deadline
    * passes — never throws, never blocks unboundedly (quarantine
    * posture).
    */
  def transcodeToY4m(bytes: Array[Byte]): Option[Array[Byte]] =
    binary.flatMap { bin =>
      try {
        val pb = new ProcessBuilder(
          bin, "-hide_banner", "-loglevel", "error", "-nostdin",
          "-i", "pipe:0", "-f", "yuv4mpegpipe", "-pix_fmt", "yuv420p",
          "pipe:1")
        pb.redirectErrorStream(false)
        val proc = pb.start()
        // stdin feeder runs on its own thread or a large blob deadlocks
        // both pipes (ffmpeg blocks writing stdout while we block
        // writing stdin).
        val feeder = new Thread(() => {
          try { proc.getOutputStream.write(bytes); proc.getOutputStream.close() }
          catch { case _: IOException => () } // ffmpeg may close stdin early
        }, "graft-ffmpeg-stdin")
        feeder.setDaemon(true)
        feeder.start()
        val drain = new Thread(() => {
          try proc.getErrorStream.readAllBytes() catch { case NonFatal(_) => () }
        }, "graft-ffmpeg-stderr")
        drain.setDaemon(true)
        drain.start()
        // stdout is read on its own daemon thread too, so the deadline
        // below bounds EVERYTHING: a hung ffmpeg is killed by
        // destroyForcibly (EOF-ing all three pipes, unblocking the
        // reader threads) and the task moves on.
        val outBuf = new java.io.ByteArrayOutputStream()
        val reader = new Thread(() => {
          try proc.getInputStream.transferTo(outBuf)
          catch { case NonFatal(_) => () }
        }, "graft-ffmpeg-stdout")
        reader.setDaemon(true)
        reader.start()
        val finished = proc.waitFor(
          TranscodeTimeoutSeconds, java.util.concurrent.TimeUnit.SECONDS)
        if (!finished) {
          proc.destroyForcibly()
          proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
          None
        } else {
          reader.join(30000)
          val out = outBuf.toByteArray
          if (proc.exitValue() == 0 && out.nonEmpty) Some(out) else None
        }
      } catch { case NonFatal(_) => None }
    }

  /** Demux a compressed blob: ffmpeg → Y4M → [[Multimodal.demuxY4m]].
    * Frame offsets index into the RETURNED Y4M bytes, not the input.
    */
  def demuxCompressed(
      bytes: Array[Byte]): Option[(Multimodal.VideoMeta, Array[Byte], Array[(Int, Int)])] =
    transcodeToY4m(bytes).flatMap { y4m =>
      Multimodal.demuxY4m(y4m).map { case (meta, frames) =>
        (meta.copy(format = "y4m-transcoded"), y4m, frames)
      }
    }

  /** Compressed-tier frame sampling — the same child-table contract as
    * [[Multimodal.frameSampleVideo]]: every `everyN`-th frame's exact
    * (post-transcode) plane bytes as (id, frame_idx, frame).
    * Blobs that are undecodable, or every blob when ffmpeg is absent,
    * contribute zero rows.
    */
  def frameSampleCompressed(
      df: DataFrame, id: String, content: String, everyN: Int): DataFrame = {
    require(everyN > 0, "everyN must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    graft.operators.Widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          demuxCompressed(bytes).iterator.flatMap { case (_, y4m, frames) =>
            frames.iterator.zipWithIndex
              .filter(_._2 % everyN == 0)
              .map { case ((off, len), idx) =>
                (rowId, idx, java.util.Arrays.copyOfRange(y4m, off, off + len))
              }
          }
        }
      }
      .toDF(id, "frame_idx", "frame")
  }

  /** Metadata tier for compressed blobs, mirroring
    * [[Multimodal.decodeVideoMeta]]'s flattened columns; undecodable
    * blobs (or all blobs, ffmpeg absent) surface as format "unknown"
    * so the quarantine router can act on them rather than losing them.
    */
  def decodeCompressedMeta(df: DataFrame, id: String, content: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.operators.Widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, bytes) =>
          demuxCompressed(bytes) match {
            case Some((m, _, _)) =>
              (rowId, m.format, m.width, m.height, m.colorspace, m.nFrames)
            case None => (rowId, "unknown", 0, 0, "", 0)
          }
        }
      }
      .toDF(id, "format", "width", "height", "colorspace", "n_frames")
  }
}
