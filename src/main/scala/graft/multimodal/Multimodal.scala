package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, decoded/featurized batch-wise in
  * `mapPartitions` (the Scala analogue of mapInPandas — one iterator per
  * partition, no per-row task overhead, executor-local codec state).
  *
  * STUB NOTICE: this container ships no image/audio codecs, so
  * `decodeStub` parses a deterministic fake header
  * (`GRFT|<fmt>|<w>|<h>|<frames>|<payload>`) instead of real JPEG/WAV
  * decoding. The Spark-side plumbing — schema, partitioning, batch
  * iteration, child-table frame output — is real and tested; swap
  * `decodeStub` for a codec binding (e.g. javacpp/ffmpeg) in production.
  */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int, nFrames: Int, payloadLen: Int)

  /** Batch decode wants one partition per core — a single dense input
    * file otherwise serializes the codec work onto one task.
    */
  private def widen(df: DataFrame): DataFrame =
    graft.operators.Widen(df)

  /** Parse the fake container header. Malformed input → format "unknown"
    * with zeroed dimensions (quarantine-able, never throws).
    */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    val s = new String(bytes, StandardCharsets.UTF_8)
    val parts = s.split("\\|", 6)
    if (parts.length == 6 && parts(0) == "GRFT")
      try MediaMeta(parts(1), parts(2).toInt, parts(3).toInt,
        parts(4).toInt, parts(5).getBytes(StandardCharsets.UTF_8).length)
      catch { case _: NumberFormatException =>
        MediaMeta("unknown", 0, 0, 0, bytes.length) }
    else MediaMeta("unknown", 0, 0, 0, bytes.length)
  }

  /** Decode metadata for every blob: (id, content) → id + flattened
    * MediaMeta columns. Batch-shaped mapPartitions; the decoder is
    * invoked once per row off one iterator, so a real codec can hold
    * per-partition native state.
    */
  def decodeMeta(df: DataFrame, id: String, content: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, bytes) =>
          val m = decodeStub(bytes)
          (rowId, m.format, m.width, m.height, m.nFrames, m.payloadLen)
        }
      }
      .toDF(id, "format", "width", "height", "n_frames", "payload_len")
  }

  /** Frame sampling: split the payload into nFrames chunks, keep every
    * `everyN`-th — the child-table shape of video frame extraction
    * ((id, frame_idx, frame) rows, FK to the parent blob).
    */
  def frameSample(
      df: DataFrame, id: String, content: String, everyN: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          val m = decodeStub(bytes)
          if (m.nFrames <= 0) Iterator.empty
          else {
            // slice bytes directly: payloadLen counts BYTES, and a
            // char-indexed substring diverges (or throws) the moment the
            // payload holds multi-byte or invalid UTF-8 sequences
            val payload = bytes.slice(bytes.length - m.payloadLen, bytes.length)
            val chunk = payload.length / m.nFrames
            (0 until m.nFrames).iterator
              .filter(_ % everyN == 0)
              .map { i =>
                val from = i * chunk
                val until =
                  if (i == m.nFrames - 1) payload.length else from + chunk
                (rowId, i, payload.slice(from, until))
              }
          }
        }
      }
      .toDF(id, "frame_idx", "frame")
  }

  /** Nearest-neighbor resize of the payload to a fixed `outW × outH`
    * grid: output byte k samples payload byte `(k · len) / (outW · outH)`
    * — the deterministic stand-in for an image resample (swap the sampler
    * for a real scaler with the same (id, content) → (id, dims, bytes)
    * shape). Empty payloads produce no row (nothing to sample).
    */
  def resize(
      df: DataFrame, id: String, content: String,
      outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, "target dimensions must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val n = outW * outH
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          val m = decodeStub(bytes)
          if (m.payloadLen <= 0) Iterator.empty
          else {
            // byte slice, not char substring — see frameSample
            val payload = bytes.slice(bytes.length - m.payloadLen, bytes.length)
            // long arithmetic: k·len overflows Int for payloads ≳ 32 MB
            val out = Array.tabulate(n)(k =>
              payload((k.toLong * payload.length / n).toInt))
            Iterator.single((rowId, outW, outH, out))
          }
        }
      }
      .toDF(id, "width", "height", "resized")
  }

  /** Deterministic fake featurizer: 16-bin byte histogram, L1-normalized
    * to a fixed-size vector — the embedding-extraction plumbing with a stub
    * feature function. Double math throughout: integer counts divided in
    * IEEE double are bit-identical across engines, so the output is exactly
    * oracle-checkable (a float32 division would round differently than the
    * oracle's double division).
    */
  def featurize(df: DataFrame, id: String, content: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, bytes) =>
          val hist = new Array[Long](16)
          bytes.foreach(b => hist((b & 0xff) % 16) += 1L)
          val total = math.max(bytes.length, 1).toDouble
          (rowId, hist.map(_ / total).toSeq)
        }
      }
      .toDF(id, "features")
  }
}
