package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import scala.util.control.NonFatal

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, decoded/featurized batch-wise in
  * `mapPartitions` (the Scala analogue of mapInPandas — one iterator per
  * partition, no per-row task overhead, executor-local codec state).
  *
  * Codec tiers:
  *   - REAL images/audio: PNG/BMP via `javax.imageio` and WAV via
  *     `javax.sound.sampled` — both ship with the JVM, no native deps.
  *     `decodeImage`/`decodeGray`/`decodeAudio` and the operators built on
  *     them (`decodeImageMeta`, `featurizeImage`, `resizeImage`,
  *     `decodeAudioMeta`) do genuine byte-level decoding of genuine
  *     containers.
  *   - REAL video: Y4M (YUV4MPEG2 — uncompressed planes behind a
  *     plain-ASCII header) demuxed byte-exactly (`demuxY4m`,
  *     `decodeVideoMeta`, `frameSampleVideo`). COMPRESSED codecs
  *     (H.264 etc.) have no JVM decoder — bind javacpp/ffmpeg behind the
  *     same (id, content) → (id, frame_idx, frame) shape in production.
  *   - STUB (legacy): `decodeStub` parses a deterministic fake container
  *     (`GRFT|<fmt>|<w>|<h>|<frames>|<payload>`); `frameSample`/`resize`/
  *     `featurize` keep the generic binary-plumbing shape testable
  *     without any codec at all.
  */
object Multimodal {

  // ImageIO defaults to a disk-backed scratch cache per encode/decode;
  // executor tasks want pure in-memory streams (global, idempotent).
  ImageIO.setUseCache(false)

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

  // --------------------------------------------------------------------
  // Real image codec (javax.imageio — PNG/BMP, JVM-bundled)
  // --------------------------------------------------------------------

  /** Container sniff from magic bytes — cheap reject before the decoder
    * runs, and the format label `ImageIO.read` itself doesn't report.
    */
  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
        bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "wav"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) "jpeg"
    else "unknown"

  /** REAL image decode: PNG/BMP/JPEG via `javax.imageio`. Malformed or
    * non-image input → format "unknown" with zeroed dimensions
    * (quarantine-able, never throws) — same contract as `decodeStub`.
    * JPEG is lossy: dimensions/format are exact, pixel-level contracts
    * live on the PNG path only.
    */
  def decodeImage(bytes: Array[Byte]): MediaMeta = {
    val fmt = sniffFormat(bytes)
    if (fmt != "png" && fmt != "bmp" && fmt != "jpeg")
      MediaMeta("unknown", 0, 0, 0, bytes.length)
    else try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) MediaMeta("unknown", 0, 0, 0, bytes.length)
      else MediaMeta(fmt, img.getWidth, img.getHeight, 1, bytes.length)
    } catch { case NonFatal(_) => MediaMeta("unknown", 0, 0, 0, bytes.length) }
  }

  /** REAL decode to an 8-bit row-major raster of band-0 samples (gray
    * level for grayscale images, red channel otherwise). Deeper rasters
    * (e.g. 16-bit grayscale PNG → TYPE_USHORT_GRAY) are rescaled to
    * 0..255 by dropping low bits, so the 8-bit contract holds for every
    * decodable image — downstream histograms must never see a sample
    * > 255. None on any malformed input.
    */
  def decodeGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = try {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      val bits = raster.getSampleModel.getSampleSize(0)
      val shift = math.max(0, bits - 8)
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = math.min(255, raster.getSample(x, y, 0) >>> shift)
          x += 1
        }
        y += 1
      }
      Some((w, h, out))
    }
  } catch { case NonFatal(_) => None }

  /** Encode a deterministic 8-bit grayscale PNG — the synthetic-blob
    * generator for entries and specs (PNG is lossless: `decodeGray` of
    * `encodeGrayPng(w,h,f)` returns exactly `f` sampled on the grid).
    */
  def encodeGrayPng(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode a deterministic 8-bit grayscale JPEG (JVM-bundled encoder).
    * JPEG is LOSSY: only container facts (dimensions, format) round-trip
    * exactly — pixel-level contracts stay on the PNG path.
    */
  def encodeGrayJpeg(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  // --------------------------------------------------------------------
  // Real audio codec (javax.sound.sampled — WAV, JVM-bundled)
  // --------------------------------------------------------------------

  final case class AudioMeta(
      format: String, sampleRate: Int, channels: Int, nFrames: Long)

  /** REAL WAV decode: header + frame count via `javax.sound.sampled`.
    * Malformed input → format "unknown" (never throws).
    */
  def decodeAudio(bytes: Array[Byte]): AudioMeta = try {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val f = ais.getFormat
      AudioMeta("wav", f.getSampleRate.toInt, f.getChannels, ais.getFrameLength)
    } finally ais.close()
  } catch { case NonFatal(_) => AudioMeta("unknown", 0, 0, 0L) }

  /** REAL PCM decode: the WAV's unsigned 8-bit mono samples as ints
    * 0..255 (None for malformed input or any other sample format —
    * this decoder is deliberately strict so featurization never
    * silently misinterprets bytes).
    */
  def decodePcm8(bytes: Array[Byte]): Option[Array[Int]] = try {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val f = ais.getFormat
      if (f.getSampleSizeInBits != 8 || f.getChannels != 1 ||
          f.getEncoding != AudioFormat.Encoding.PCM_UNSIGNED) None
      else {
        val n = ais.getFrameLength.toInt
        val buf = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = ais.read(buf, off, n - off)
          if (r <= 0) throw new java.io.EOFException("short WAV body")
          off += r
        }
        Some(buf.map(_ & 0xff))
      }
    } finally ais.close()
  } catch { case NonFatal(_) => None }

  /** REAL audio featurization: decode the WAV's PCM samples and emit
    * per-frame RMS energy and zero-crossing count — the standard cheap
    * features behind voice-activity/silence filtering of audio corpora.
    * Samples center as x = (s − 128)/128 (exact dyadic rationals, so
    * the per-frame Σx² is bit-exact in double regardless of fold order
    * and the whole feature is oracle-recomputable with no rounding);
    * only COMPLETE frames are emitted (the tail partial frame carries
    * no comparable energy). Undecodable blobs produce no rows.
    */
  def audioFeatures(
      df: DataFrame, id: String, content: String, frameSize: Int): DataFrame = {
    require(frameSize > 0, "frameSize must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          decodePcm8(bytes).iterator.flatMap { s =>
            val nFrames = s.length / frameSize
            (0 until nFrames).iterator.map { f =>
              var sumSq = 0.0
              var zc = 0
              var k = f * frameSize
              val end = k + frameSize
              while (k < end) {
                val x = (s(k) - 128) / 128.0
                sumSq += x * x
                if (k > f * frameSize &&
                    (s(k) >= 128) != (s(k - 1) >= 128)) zc += 1
                k += 1
              }
              (rowId, f, math.sqrt(sumSq / frameSize), zc)
            }
          }
        }
      }
      .toDF(id, "frame_idx", "rms", "zc")
  }

  /** Encode unsigned 8-bit mono PCM samples as a WAV container. */
  def encodeWavPcm8(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate.toFloat, 8, 1, false, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  // --------------------------------------------------------------------
  // Real video container (Y4M / YUV4MPEG2: plain-ASCII header + raw
  // uncompressed planes — a genuinely public format demuxable byte-
  // exactly on the JVM without native codecs)
  // --------------------------------------------------------------------

  final case class VideoMeta(
      format: String, width: Int, height: Int, colorspace: String,
      nFrames: Int)

  /** Bytes per frame for a Y4M colorspace tag (C420* subsamples chroma
    * 2×2, C422 2×1, C444 none, Cmono has no chroma planes). None for
    * tags this demuxer doesn't know — better no rows than wrong offsets.
    */
  private[multimodal] def y4mFrameSize(
      w: Int, h: Int, cs: String): Option[Long] =
    if (w <= 0 || h <= 0) None
    else cs match {
      case "mono" => Some(w.toLong * h)
      case c if c.startsWith("420") => Some(w.toLong * h * 3 / 2)
      case "422" => Some(w.toLong * h * 2)
      case "444" => Some(w.toLong * h * 3)
      case _ => None
    }

  /** REAL Y4M demux: parse the `YUV4MPEG2 W.. H.. [C..]` stream header,
    * then walk the `FRAME`-delimited raw planes, returning the metadata
    * and each frame's exact (offset, length) in the blob. None on ANY
    * malformation — truncated frame, unknown colorspace, missing marker
    * — because a misaligned offset would silently demux garbage.
    */
  def demuxY4m(bytes: Array[Byte]): Option[(VideoMeta, Array[(Int, Int)])] = {
    val Magic = "YUV4MPEG2"
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != 0x0a) i += 1
      i // == bytes.length when unterminated (caller rejects)
    }
    val hEnd = lineEnd(0)
    if (hEnd >= bytes.length) return None
    val header = new String(bytes, 0, hEnd, StandardCharsets.US_ASCII)
    if (!header.startsWith(Magic)) return None
    val params = header.drop(Magic.length).trim.split("\\s+").filter(_.nonEmpty)
    var w = -1; var h = -1
    var cs = "420" // the spec's default when no C tag is present
    try params.foreach { p =>
      p.charAt(0) match {
        case 'W' => w = p.tail.toInt
        case 'H' => h = p.tail.toInt
        case 'C' => cs = p.tail
        case _ => () // F/I/A/X tags don't affect demuxing
      }
    } catch { case _: NumberFormatException => return None }
    val frameSize = y4mFrameSize(w, h, cs) match {
      case Some(sz) if sz <= Int.MaxValue.toLong => sz.toInt
      case _ => return None
    }
    val frames = Array.newBuilder[(Int, Int)]
    var pos = hEnd + 1
    while (pos < bytes.length) {
      val fEnd = lineEnd(pos)
      if (fEnd >= bytes.length) return None
      val marker = new String(bytes, pos, fEnd - pos, StandardCharsets.US_ASCII)
      if (!marker.startsWith("FRAME")) return None
      val dataStart = fEnd + 1
      if (dataStart + frameSize > bytes.length) return None // truncated
      frames += ((dataStart, frameSize))
      pos = dataStart + frameSize
    }
    val out = frames.result()
    Some((VideoMeta("y4m", w, h, cs, out.length), out))
  }

  // --------------------------------------------------------------------
  // Real video container #2: AVI (RIFF) — the Microsoft container every
  // MJPEG webcam/capture pipeline emits. The demuxer walks the RIFF
  // chunk tree (LIST hdrl → avih/strh for metadata, LIST movi → ##dc/
  // ##db chunks for frame payloads); frame DECODE is then the frame
  // codec's problem — MJPEG frames are plain JPEGs, which javax.imageio
  // reads natively, so MJPEG-in-AVI is fully decodable on the JVM.
  // --------------------------------------------------------------------

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, StandardCharsets.US_ASCII)

  /** REAL AVI demux: walk the RIFF chunk tree and return the stream
    * metadata (avih width/height, strh codec handler) plus each movi
    * frame chunk's exact (offset, length). None on ANY malformation —
    * truncated chunk, missing avih/movi, or an avih frame count that
    * contradicts the movi walk — a misaligned RIFF walk would hand the
    * frame codec garbage. Unknown chunks (JUNK, idx1, odml) skip
    * harmlessly, as the spec requires.
    */
  def demuxAvi(bytes: Array[Byte]): Option[(VideoMeta, Array[(Int, Int)])] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
      fourcc(bytes, 8) != "AVI ") return None
    val riffEnd = {
      val declared = 8L + u32le(bytes, 4)
      if (declared > bytes.length) return None
      declared.toInt
    }
    var w = -1; var h = -1; var declaredFrames = -1L
    var handler = "unknown"
    val frames = Array.newBuilder[(Int, Int)]
    var nFrames = 0
    // walk one LIST body; lists nest (hdrl contains strl), so recurse
    def walk(from: Int, until: Int, inMovi: Boolean): Boolean = {
      var pos = from
      while (pos < until) {
        if (pos + 8 > until) return false
        val cc = fourcc(bytes, pos)
        val sz = u32le(bytes, pos + 4)
        val dataStart = pos + 8
        if (sz > Int.MaxValue || dataStart + sz > until) return false
        val dataEnd = dataStart + sz.toInt
        cc match {
          case "LIST" =>
            if (sz < 4) return false
            val listType = fourcc(bytes, dataStart)
            if (!walk(dataStart + 4, dataEnd,
              inMovi || listType == "movi")) return false
          case "avih" =>
            if (sz < 40) return false
            declaredFrames = u32le(bytes, dataStart + 16)
            w = u32le(bytes, dataStart + 32).toInt
            h = u32le(bytes, dataStart + 36).toInt
          case "strh" =>
            if (sz < 8) return false
            if (fourcc(bytes, dataStart) == "vids")
              handler = fourcc(bytes, dataStart + 4).trim.toLowerCase
          case c if inMovi && c.length == 4 &&
              c(0).isDigit && c(1).isDigit &&
              (c.substring(2) == "dc" || c.substring(2) == "db") =>
            frames += ((dataStart, sz.toInt))
            nFrames += 1
          case _ => () // JUNK, idx1, strf, odml... — skip per spec
        }
        pos = dataEnd + (sz.toInt & 1) // chunks pad to even
      }
      true
    }
    if (!walk(12, riffEnd, inMovi = false)) return None
    if (w <= 0 || h <= 0) return None // no (usable) avih
    if (declaredFrames > 0 && declaredFrames != nFrames) return None
    val out = frames.result()
    if (out.isEmpty) return None // no movi payload
    Some((VideoMeta("avi", w, h, handler, out.length), out))
  }

  /** Encode a minimal spec-conformant AVI container around the given
    * frame payloads (any per-frame codec bytes — MJPEG JPEGs, raw DIBs).
    * The synthetic-blob generator for entries and specs; `demuxAvi`
    * round-trips it byte-exactly.
    */
  def encodeAvi(
      w: Int, h: Int, handler: String,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(handler.length == 4, "fourcc handler must be 4 chars")
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val pad = if ((data.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
      cc.getBytes(StandardCharsets.US_ASCII) ++ le32(data.length) ++ data ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes(StandardCharsets.US_ASCII) ++ body)
    val avih = le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
    val strh = "vids".getBytes(StandardCharsets.US_ASCII) ++
      handler.getBytes(StandardCharsets.US_ASCII) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(30) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(0xffffffffL) ++ le32(0) ++
      Array.fill(8)(0.toByte)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++
      Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++
      handler.getBytes(StandardCharsets.US_ASCII) ++
      le32(w.toLong * h * 3) ++ Array.fill(16)(0.toByte)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = "AVI ".getBytes(StandardCharsets.US_ASCII) ++ hdrl ++ movi
    "RIFF".getBytes(StandardCharsets.US_ASCII) ++ le32(body.length) ++ body
  }

  /** Format-dispatching demux: Y4M streams and RIFF AVI containers both
    * land on the same (meta, frame offsets) shape.
    */
  def demuxVideo(bytes: Array[Byte]): Option[(VideoMeta, Array[(Int, Int)])] =
    if (bytes.length >= 4 &&
      fourcc(bytes, 0) == "RIFF") demuxAvi(bytes)
    else demuxY4m(bytes)

  /** Encode a deterministic monochrome Y4M container — the synthetic-
    * blob generator for entries and specs (Y4M is uncompressed:
    * `demuxY4m` of `encodeY4mMono(w,h,n,f)` returns exactly `f` sampled
    * per frame/pixel).
    */
  def encodeY4mMono(
      w: Int, h: Int, nFrames: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(
      s"YUV4MPEG2 W$w H$h F30:1 Ip A1:1 Cmono\n"
        .getBytes(StandardCharsets.US_ASCII))
    var f = 0
    while (f < nFrames) {
      bos.write("FRAME\n".getBytes(StandardCharsets.US_ASCII))
      var k = 0
      val n = w * h
      while (k < n) { bos.write(pixel(f, k) & 0xff); k += 1 }
      f += 1
    }
    bos.toByteArray
  }

  /** REAL video metadata per blob: (id, format, width, height,
    * colorspace, n_frames). Malformed blobs quarantine as "unknown"
    * rows, same contract as `decodeImageMeta`.
    */
  def decodeVideoMeta(df: DataFrame, id: String, content: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, bytes) =>
          demuxVideo(bytes) match {
            case Some((m, _)) =>
              (rowId, m.format, m.width, m.height, m.colorspace, m.nFrames)
            case None => (rowId, "unknown", 0, 0, "", 0)
          }
        }
      }
      .toDF(id, "format", "width", "height", "colorspace", "n_frames")
  }

  /** REAL video frame sampling: demux the Y4M container and emit every
    * `everyN`-th frame's exact plane bytes as (id, frame_idx, frame) —
    * the child-table shape of frame extraction, with offsets that came
    * from the container itself rather than an assumed layout.
    * Undecodable blobs produce no rows (quarantine upstream via
    * `decodeVideoMeta`).
    */
  def frameSampleVideo(
      df: DataFrame, id: String, content: String, everyN: Int): DataFrame = {
    require(everyN > 0, "everyN must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          demuxVideo(bytes).iterator.flatMap { case (_, frames) =>
            frames.iterator.zipWithIndex
              .filter(_._2 % everyN == 0)
              .map { case ((off, len), idx) =>
                (rowId, idx, java.util.Arrays.copyOfRange(bytes, off, off + len))
              }
          }
        }
      }
      .toDF(id, "frame_idx", "frame")
  }

  /** Decode metadata for every blob: (id, content) → id + flattened
    * MediaMeta columns. Batch-shaped mapPartitions; the decoder is
    * invoked once per row off one iterator, so a real codec can hold
    * per-partition native state.
    */
  private def metaWith(decoder: Array[Byte] => MediaMeta)(
      df: DataFrame, id: String, content: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, bytes) =>
          val m = decoder(bytes)
          (rowId, m.format, m.width, m.height, m.nFrames, m.payloadLen)
        }
      }
      .toDF(id, "format", "width", "height", "n_frames", "payload_len")
  }

  /** Stub-container metadata decode (video stand-in; see STUB notice). */
  def decodeMeta(df: DataFrame, id: String, content: String): DataFrame =
    metaWith(decodeStub)(df, id, content)

  /** REAL image metadata decode over PNG/BMP blobs. */
  def decodeImageMeta(df: DataFrame, id: String, content: String): DataFrame =
    metaWith(decodeImage)(df, id, content)

  /** REAL audio metadata decode over WAV blobs: (id, content) → id +
    * format/sample_rate/channels/n_frames.
    */
  def decodeAudioMeta(df: DataFrame, id: String, content: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, bytes) =>
          val m = decodeAudio(bytes)
          (rowId, m.format, m.sampleRate, m.channels, m.nFrames)
        }
      }
      .toDF(id, "format", "sample_rate", "channels", "n_frames")
  }

  /** REAL image featurizer: decode, then a `bins`-bin histogram of gray
    * levels, L1-normalized (counts / pixel count, IEEE double — exactly
    * oracle-recomputable). Undecodable blobs produce no row.
    */
  def featurizeImage(
      df: DataFrame, id: String, content: String, bins: Int = 16): DataFrame = {
    require(bins > 0 && 256 % bins == 0, s"bins must divide 256, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          decodeGray(bytes).iterator.map { case (w, h, px) =>
            val hist = new Array[Long](bins)
            val span = 256 / bins
            px.foreach(v => hist(v / span) += 1L)
            val total = (w.toLong * h).toDouble
            (rowId, hist.map(_ / total).toSeq)
          }
        }
      }
      .toDF(id, "features")
  }

  /** REAL nearest-neighbor image resize: decode, then sample the source
    * raster at `(ox·w/outW, oy·h/outH)` — the standard NN grid. Output is
    * the resampled gray raster as an int array (row-major). Undecodable
    * blobs produce no row.
    */
  def resizeImage(
      df: DataFrame, id: String, content: String,
      outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, "target dimensions must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          decodeGray(bytes).iterator.map { case (w, h, px) =>
            val out = new Array[Int](outW * outH)
            var oy = 0
            while (oy < outH) {
              val sy = oy * h / outH
              var ox = 0
              while (ox < outW) {
                out(oy * outW + ox) = px(sy * w + ox * w / outW)
                ox += 1
              }
              oy += 1
            }
            (rowId, outW, outH, out.toSeq)
          }
        }
      }
      .toDF(id, "width", "height", "resized")
  }

  /** dHash perceptual image fingerprint (difference hash — the standard
    * cheap near-dup hash for image corpora): decode to the 8-bit gray
    * raster, nearest-neighbor-resample to `(hashW+1) × hashH` (the same
    * `src = dst · srcDim / outDim` floor sampling as [[resizeImage]], so
    * both are oracle-re-derivable with identical integer arithmetic),
    * then bit `y·hashW + x` = 1 iff `r(x,y) > r(x+1,y)` — the hash
    * encodes horizontal GRADIENT SIGNS, so global brightness/contrast
    * shifts and small re-encodes preserve it while different pictures
    * diverge ~half the bits. Packed MSB-first into one long (bit 0 of
    * the hash = bit `hashW·hashH − 1` of the long), matching the SimHash
    * packing so [[graft.dedup.SimHash.nearPairsFromFingerprints]] bands
    * it directly. `hashW·hashH ≤ 64`; undecodable blobs produce no row.
    */
  def dhashImage(
      df: DataFrame, id: String, content: String,
      hashW: Int = 8, hashH: Int = 8): DataFrame = {
    require(hashW > 0 && hashH > 0 && hashW * hashH <= 64,
      "dHash must fit in one long (hashW * hashH <= 64)")
    val spark = df.sparkSession
    import spark.implicits._
    val inW = hashW + 1
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          decodeGray(bytes).iterator.map { case (w, h, px) =>
            var acc = 0L
            var y = 0
            while (y < hashH) {
              val sy = y * h / hashH
              var x = 0
              while (x < hashW) {
                val l = px(sy * w + x * w / inW)
                val r = px(sy * w + (x + 1) * w / inW)
                acc = (acc << 1) | (if (l > r) 1L else 0L)
                x += 1
              }
              y += 1
            }
            (rowId, acc)
          }
        }
      }
      .toDF("id", "fp")
  }

  /** dHash-style perceptual AUDIO fingerprint over decoded WAV PCM —
    * the energy-gradient analogue of [[dhashImage]] (frame-energy
    * difference signs are the core of classic audio fingerprinting à la
    * Haitsma-Kalder, minus the spectral transform, which an 8-bit PCM
    * oracle can't re-derive bit-exactly): samples split into
    * `nBits + 1` near-equal frames (sample i → frame `i·(nBits+1)/n`,
    * the same floor partitioning the resamplers use), frame energy =
    * plain sample sum (integers — no float drift), bit k = 1 iff
    * `e(k) > e(k+1)`, packed MSB-first like [[dhashImage]] so
    * [[graft.dedup.SimHash.nearPairsFromFingerprints]] bands it
    * directly. A level shift adds ~equally to every frame's energy, so
    * re-leveled recordings keep their fingerprint (frame sizes differ
    * by at most one sample). Undecodable or shorter-than-`nBits+1`
    * blobs produce no row.
    */
  def audioFingerprint(
      df: DataFrame, id: String, content: String,
      nBits: Int = 64): DataFrame = {
    require(nBits > 0 && nBits <= 64, "fingerprint must fit in one long")
    val spark = df.sparkSession
    import spark.implicits._
    val frames = nBits + 1
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          decodePcm8(bytes).iterator
            .filter(_.length >= frames)
            .map { samples =>
              val n = samples.length
              val e = new Array[Long](frames)
              var i = 0
              while (i < n) {
                e(i * frames / n) += samples(i)
                i += 1
              }
              var acc = 0L
              var k = 0
              while (k < nBits) {
                acc = (acc << 1) | (if (e(k) > e(k + 1)) 1L else 0L)
                k += 1
              }
              (rowId, acc)
            }
        }
      }
      .toDF("id", "fp")
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

  /** Letterbox/border detection over decoded gray rasters — the image-
    * curation probe for padded thumbnails and pillarboxed frames: the
    * count of leading/trailing rows and columns that are each entirely
    * UNIFORM (one constant value per line — black bars, white mattes).
    * Downstream crops to the content box before hashing/featurizing,
    * or drops images whose content box vanishes. Output per image:
    * (id, width, height, top, bottom, left, right). Executor-side
    * real decode; undecodable blobs drop (quarantine path).
    */
  def letterboxDetect(df: DataFrame, id: String, content: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          decodeGray(bytes).map { case (w, h, px) =>
            def rowUniform(y: Int) =
              (1 until w).forall(x => px(y * w + x) == px(y * w))
            def colUniform(x: Int) =
              (1 until h).forall(y => px(y * w + x) == px(x))
            val top = (0 until h).takeWhile(rowUniform).size
            val bottom = (0 until h).reverseIterator
              .takeWhile(rowUniform).size
            val left = (0 until w).takeWhile(colUniform).size
            val right = (0 until w).reverseIterator
              .takeWhile(colUniform).size
            (rowId, w, h, top, bottom, left, right)
          }
        }
      }
      .toDF(id, "width", "height", "top", "bottom", "left", "right")
  }

  /** Leading/trailing silence trim over PCM8 WAV blobs — the audio-
    * curation cut every speech pipeline makes before feature
    * extraction (silence carries storage and compute, no signal): a
    * sample is silent when |v − 128| ≤ eps (PCM8's unsigned center),
    * and the trim reports the leading/trailing silent runs plus the
    * kept span. All-silent clips report kept = 0 with both trims at
    * the full length — the "drop this clip" signal. Executor-side
    * decode (batch-shaped mapPartitions, the mm-tier convention);
    * undecodable blobs drop to the quarantine path like the other
    * audio ops.
    */
  def silenceTrim(df: DataFrame, id: String, content: String,
      eps: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          decodePcm8(bytes).map { s =>
            val active = s.indices.filter(k => math.abs(s(k) - 128) > eps)
            if (active.isEmpty) (rowId, s.length, s.length, s.length, 0)
            else (rowId, s.length, active.head,
              s.length - 1 - active.last, active.last - active.head + 1)
          }
        }
      }
      .toDF(id, "n_samples", "lead_trim", "trail_trim", "kept")
  }

  /** Per-image raster statistics — the exposure/degeneracy gate image
    * curation runs before anything expensive: a constant or
    * near-constant raster (std ≈ 0, entropy ≈ 0) is a blank/failed
    * render, a both-ends-clipped histogram is a scan artifact, and the
    * stats are one decode-walk pass per image. Reports (width, height,
    * mean, std — population, from exact integer sums), 16-bucket
    * histogram entropy in bits (each p·log₂p term quantized to 9
    * decimals, the charEntropy convention), min/max pixel, and the
    * modal bucket (ties to the LOWER bucket). All accumulation is
    * integer; doubles appear only at the final mean/std/entropy
    * hand-off, so the oracle re-derives everything from generator
    * arithmetic.
    */
  def imageStats(df: DataFrame, id: String, content: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          decodeGray(bytes).map { case (w, h, px) =>
            val n = w.toLong * h
            var sum = 0L
            var sumSq = 0L
            var mn = 255
            var mx = 0
            val hist = new Array[Long](16)
            var i = 0
            while (i < px.length) {
              val v = px(i)
              sum += v
              sumSq += v.toLong * v
              if (v < mn) mn = v
              if (v > mx) mx = v
              hist(v / 16) += 1
              i += 1
            }
            val mean = sum.toDouble / n
            val variance = (sumSq.toDouble - sum.toDouble * sum / n) / n
            val entropy = -hist.filter(_ > 0).map { c =>
              val p = c.toDouble / n
              BigDecimal(p * math.log(p) / math.log(2.0))
                .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
            }.sum
            val mode = hist.indexOf(hist.max)
            (rowId, w, h,
              BigDecimal(mean).setScale(4,
                BigDecimal.RoundingMode.HALF_UP).toDouble,
              BigDecimal(math.sqrt(math.max(0.0, variance))).setScale(4,
                BigDecimal.RoundingMode.HALF_UP).toDouble,
              BigDecimal(entropy).setScale(4,
                BigDecimal.RoundingMode.HALF_UP).toDouble,
              mn, mx, mode)
          }
        }
      }
      .toDF(id, "width", "height", "mean_px", "std_px", "entropy",
        "min_px", "max_px", "mode_bucket")
  }

  /** Windowed loudness profile over PCM8 audio — the level signal an
    * audio-curation pipeline gates on (clips that are near-silence,
    * clipped at full scale, or wildly level-inconsistent across time
    * are the ones to drop or renormalize before training). One row per
    * NON-OVERLAPPING window of `window` samples (the tail window may be
    * short): `rms` is the root-mean-square of the center-removed
    * samples normalized to full scale (|s−128|/127, rounded 6), `db`
    * the dBFS reading 20·log10(rms) (rounded 4; NULL for an all-center
    * digital-silence window — there is no dB for zero), `peak` the max
    * absolute deviation (raw 0..128 integer).
    *
    * Determinism across engines: the windowed accumulation is the SUM
    * OF SQUARED INTEGER deviations (exact in any order), lifted to
    * double only for the final sqrt/log — so the oracle can re-derive
    * every value from generator arithmetic without float-order drift.
    *
    * Scale shape: the same batch-shaped mapPartitions decode walk as
    * [[silenceTrim]]; windows emit from the decoded array in-task, so
    * nothing wider than (id, window stats) ever shuffles.
    */
  def loudnessWindows(df: DataFrame, id: String, content: String,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          decodePcm8(bytes).toSeq.flatMap { s =>
            s.grouped(window).zipWithIndex.map { case (w, wi) =>
              var ss = 0L
              var peak = 0
              var i = 0
              while (i < w.length) {
                val d = math.abs(w(i) - 128)
                ss += d.toLong * d
                if (d > peak) peak = d
                i += 1
              }
              val rms = math.sqrt(ss.toDouble / (w.length * 127.0 * 127.0))
              val db: Option[Double] =
                if (ss == 0L) None
                else Some(BigDecimal(20.0 * math.log10(rms))
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
              (rowId, wi, w.length,
                BigDecimal(rms).setScale(6,
                  BigDecimal.RoundingMode.HALF_UP).toDouble,
                db, peak)
            }
          }
        }
      }
      .toDF(id, "win", "n_samples", "rms", "db", "peak")
  }

  /** Zero-crossing profile over PCM8 audio — the cheap spectral proxy
    * audio curation pairs with [[loudnessWindows]]: high ZCR separates
    * fricatives/noise/hiss from voiced speech and tone, so clips that
    * are all-noise (ZCR near 0.5) or DC-stuck (ZCR 0 with nonzero
    * level) surface without an FFT. One row per clip: `crossings`
    * counts strictly-opposite-sign adjacent center-removed sample
    * pairs (a zero sample breaks a run — no crossing through silence),
    * `zcr` = crossings/(n−1) rounded 6 (null for n < 2), all integer
    * arithmetic until the final divide.
    *
    * Scale shape: the [[silenceTrim]] mapPartitions decode walk; only
    * (id, scalars) ever shuffles.
    */
  def zeroCrossings(df: DataFrame, id: String, content: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df).select(col(id).cast("long"), col(content))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (rowId, bytes) =>
          decodePcm8(bytes).map { s =>
            var crossings = 0L
            var i = 1
            while (i < s.length) {
              if ((s(i) - 128) * (s(i - 1) - 128) < 0) crossings += 1
              i += 1
            }
            val zcr: Option[Double] =
              if (s.length < 2) None
              else Some(BigDecimal(crossings.toDouble / (s.length - 1))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            (rowId, s.length, crossings, zcr)
          }
        }
      }
      .toDF(id, "n_samples", "crossings", "zcr")
  }

  /** Scene-cut detection over demuxed raw frames: the mean absolute
    * per-pixel delta between CONSECUTIVE frames, flagged against a
    * threshold — the shot-boundary signal a video-curation pipeline
    * segments on before sampling frames per shot (uniform sampling
    * over-covers static scenes and misses cuts). One row per adjacent
    * frame pair: (id, frame_idx, mean_delta rounded 4, is_cut), where
    * `frame_idx` is the EARLIER frame. Single-frame videos emit
    * nothing — there is no pair.
    *
    * Scale shape: frames demux executor-side ([[frameSampleVideo]]'s
    * mapPartitions walk), pixels lift to int arrays once, and the
    * consecutive pairing is an (id, frame_idx) equi-join — frames of
    * one video co-locate by key; no window over frame payloads, no
    * cross-frame shuffle beyond the keyed join.
    */
  def sceneCuts(df: DataFrame, id: String, content: String,
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val px = frameSampleVideo(df, id, content, everyN = 1)
      .as[(Long, Int, Array[Byte])]
      .map { case (i, f, b) => (i, f, b.map(x => x & 0xff).toSeq) }
      .toDF(id, "fi", "px")
    val a = px.select(col(id), col("fi"), col("px").as("pa"))
    val b = px.select(col(id), (col("fi") - 1).as("fi"),
      col("px").as("pb"))
    a.join(b, Seq(id, "fi"))
      .select(col(id), col("fi").cast("int").as("frame_idx"),
        round(aggregate(
          zip_with(col("pa"), col("pb"), (x, y) => abs(x - y)),
          lit(0L), (acc, v) => acc + v).cast("double") /
          greatest(size(col("pa")), lit(1)), 4).as("mean_delta"))
      .withColumn("is_cut", col("mean_delta") >= threshold)
  }

  /** Shot-aware keyframe sampling — what [[sceneCuts]] exists FOR:
    * frames group into shots (a shot starts at frame 0 and after every
    * cut) and each shot contributes its first frame as the keyframe,
    * so downstream image curation sees one representative per shot
    * instead of uniform samples that over-cover static scenes. Output
    * per (video, shot): (id, shot, keyframe_idx, n_frames).
    *
    * Scale shape: [[sceneCuts]]'s keyed join, then the shot assignment
    * rides a per-video inequality join against that video's cut list
    * (cuts per video are few — the fan-out is frames × cuts within one
    * video, never across videos) and two keyed aggregates.
    */
  def shotSample(df: DataFrame, id: String, content: String,
      threshold: Double): DataFrame = {
    val cuts = sceneCuts(df, id, content, threshold)
      .where(col("is_cut"))
      .select(col(id), (col("frame_idx") + 1).as("__start"))
    val frames = frameSampleVideo(df, id, content, everyN = 1)
      .select(col(id), col("frame_idx").as("fi"))
    frames.join(cuts,
        frames(id) === cuts(id) && col("__start") <= col("fi"), "left")
      .select(frames(id).as(id), col("fi"), col("__start"))
      .groupBy(col(id), col("fi"))
      .agg(count(col("__start")).as("shot"))
      .groupBy(col(id), col("shot"))
      .agg(min(col("fi")).cast("int").as("keyframe_idx"),
        count(lit(1)).as("n_frames"))
  }
}
