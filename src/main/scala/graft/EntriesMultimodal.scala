package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import org.apache.spark.sql.types.StructType

import graft.ann.Ann
import graft.dedup.{Clusters, Dedup, SimHash}
import graft.ingest.{FileListing, Router, ZipSource}
import graft.multimodal.Multimodal
import graft.operators.Salted
import graft.pipeline.SchemaEvolution
import graft.schema.{ColumnSpec, TableSpec}
import graft.streaming.Bookmark
import graft.text.{Dsir, TextAnalysis}
import graft.relationalize.Relationalize
import graft.sources.{JsonDataset, ParquetDataset, TarShards, Warc}
import graft.validate.{ErrorSuppression, FileMetadata, JsonSchemaValidator, SchemaCache, SchemaResolver}


/** LLM-pipeline multimodal tier (real PNG/BMP/WAV/Y4M codecs).
  *
  * Split from the single SparkEntry registry file by tier; entry
  * semantics, names, and oracles are unchanged. [[SparkEntry]] holds
  * the one declaration-ordered registry over all tiers.
  */
private[graft] object EntriesMultimodal {
  import EntryKit._

  // LLM-pipeline: multimodal binary columns — REAL codecs for all three
  // modalities: PNG/BMP via javax.imageio, WAV via javax.sound.sampled,
  // Y4M video demuxed byte-exactly from the container's own markers
  // --------------------------------------------------------------------

  /** Deterministic REAL grayscale PNGs, encoded executor-side: dims and
    * every pixel are pure functions of doc_id (`px(x,y) = (31·id + 7x +
    * 13y) mod 256`), so the DuckDB oracle re-derives every decoded fact
    * from the base table while the engine does genuine PNG byte decoding.
    */
  def mmPngBlobs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long].map { id =>
      val w = (16 + id % 16).toInt
      val h = (12 + id % 8).toInt
      (id, Multimodal.encodeGrayPng(w, h,
        (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt))
    }.toDF("doc_id", "content")
  }

  /** Deterministic REAL WAV blobs (unsigned 8-bit mono PCM). */
  def mmWavBlobs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long].map { id =>
      val n = (100 + id % 50).toInt
      val samples = Array.tabulate(n)(k => ((id + k * 17) % 256).toByte)
      (id, Multimodal.encodeWavPcm8(samples, sampleRate = 8000))
    }.toDF("doc_id", "content")
  }

  /** Letterbox detection ([[Multimodal.letterboxDetect]]): PNGs with a
    * PLANTED uniform border of thickness id%3 around an always-varying
    * interior — the engine decodes real rasters and scans line
    * uniformity; the oracle derives every count from the planting.
    */
  val mmLetterbox = Q(
    (s, dir) => {
      import s.implicits._
      val blobs = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val (w, h, t) = ((8 + id % 8).toInt, (6 + id % 6).toInt,
            (id % 3).toInt)
          (id, Multimodal.encodeGrayPng(w, h, (x, y) =>
            if (x < t || y < t || x >= w - t || y >= h - t) 0
            else ((id * 31 + x * 7 + y * 13) % 256).toInt))
        }.toDF("doc_id", "content")
      Multimodal.letterboxDetect(blobs, "doc_id", "content")
    },
    Some("SELECT doc_id, CAST(8 + doc_id % 8 AS INT) AS width, CAST(6 + doc_id % 6 AS INT) AS height, " +
      "CAST(doc_id % 3 AS INT) AS \"top\", CAST(doc_id % 3 AS INT) AS \"bottom\", CAST(doc_id % 3 AS INT) AS \"left\", CAST(doc_id % 3 AS INT) AS \"right\" FROM documents"))

  /** Windowed audio loudness ([[Multimodal.loudnessWindows]]): real
    * PCM8 WAV decode → per-16-sample-window RMS (full-scale
    * normalized), dBFS, and peak deviation — the level gate an audio
    * curation pipeline drops near-silent or clipped clips on. The
    * windowed accumulation is an exact integer sum of squares, so the
    * oracle re-derives every value from the generator arithmetic
    * (`sample k = 158 + (id+k) % 60`, deviation 30..89) with one sqrt
    * and one log at the hand-off.
    */
  val mmAudioLoudness = Q(
    (s, dir) => Multimodal.loudnessWindows(
      mmWavBlobs(s, dir), "doc_id", "content", window = 16),
    Some("WITH d AS (SELECT doc_id, 100 + doc_id % 50 AS n FROM documents), " +
      "k AS (SELECT doc_id, unnest(generate_series(0, CAST(n AS INT) - 1)) AS k FROM d), " +
      "sm AS (SELECT doc_id, CAST(k // 16 AS INT) AS win, abs(CAST((doc_id + k * 17) % 256 AS INT) - 128) AS dev FROM k), " +
      "w AS (SELECT doc_id, win, count(*) AS nw, sum(dev * dev) AS ss, max(dev) AS peak FROM sm GROUP BY 1, 2) " +
      "SELECT doc_id, win, CAST(nw AS INT) AS n_samples, " +
      "round(sqrt(CAST(ss AS DOUBLE) / (nw * 127.0 * 127.0)), 6) AS rms, " +
      "CASE WHEN ss = 0 THEN NULL ELSE round(20 * log10(sqrt(CAST(ss AS DOUBLE) / (nw * 127.0 * 127.0))), 4) END AS db, " +
      "CAST(peak AS INT) AS peak FROM w"))

  /** Per-image raster statistics ([[Multimodal.imageStats]]): real PNG
    * decode → exact-integer mean/std/min/max, 16-bucket histogram
    * entropy, modal bucket — the blank/clipped/degenerate-render gate.
    * The oracle rebuilds every pixel from the generator arithmetic
    * (`px = (31·id + 7x + 13y) % 256`) and replays the same quantized
    * entropy folds.
    */
  val mmImageStats = Q(
    (s, dir) => Multimodal.imageStats(mmPngBlobs(s, dir), "doc_id",
      "content"),
    Some("WITH d AS (SELECT doc_id, CAST(16 + doc_id % 16 AS INT) AS w, CAST(12 + doc_id % 8 AS INT) AS h FROM documents), " +
      "px AS (SELECT doc_id, w, h, CAST((doc_id * 31 + x * 7 + y * 13) % 256 AS INT) AS v FROM d, (SELECT unnest(generate_series(0, 31)) AS x) xs, (SELECT unnest(generate_series(0, 19)) AS y) ys WHERE x < w AND y < h), " +
      "st AS (SELECT doc_id, w, h, sum(v) AS s, sum(v * v) AS ss, min(v) AS mn, max(v) AS mx, count(*) AS n FROM px GROUP BY 1, 2, 3), " +
      "hb AS (SELECT doc_id, v // 16 AS b, count(*) AS c FROM px GROUP BY 1, 2), " +
      "ent AS (SELECT hb.doc_id, round(-sum(round((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n) / ln(2), 9)), 4) AS entropy FROM hb JOIN st ON st.doc_id = hb.doc_id GROUP BY 1), " +
      "md AS (SELECT doc_id, b FROM (SELECT doc_id, b, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, b) AS r FROM hb) WHERE r = 1) " +
      "SELECT st.doc_id, w AS width, h AS height, round(CAST(s AS DOUBLE) / n, 4) AS mean_px, " +
      "round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n), 4) AS std_px, " +
      "entropy, CAST(mn AS INT) AS min_px, CAST(mx AS INT) AS max_px, CAST(md.b AS INT) AS mode_bucket " +
      "FROM st JOIN ent ON ent.doc_id = st.doc_id JOIN md ON md.doc_id = st.doc_id"))

  /** Audio zero-crossing profile ([[Multimodal.zeroCrossings]]): real
    * PCM8 decode → strict-opposite-sign adjacent-pair count and rate —
    * the FFT-free noise-vs-voiced proxy beside `mm_audio_loudness`.
    * Integer arithmetic until the final divide; the oracle replays the
    * generator samples through a lag window.
    */
  val mmAudioZcr = Q(
    (s, dir) => Multimodal.zeroCrossings(
      mmWavBlobs(s, dir), "doc_id", "content"),
    Some("WITH d AS (SELECT doc_id, 100 + doc_id % 50 AS n FROM documents), " +
      "k AS (SELECT doc_id, n, unnest(generate_series(0, CAST(n AS INT) - 1)) AS k FROM d), " +
      "sm AS (SELECT doc_id, n, k, CAST((doc_id + k * 17) % 256 AS INT) - 128 AS dev FROM k), " +
      "lg AS (SELECT doc_id, n, dev, lag(dev) OVER (PARTITION BY doc_id ORDER BY k) AS prev FROM sm), " +
      "c AS (SELECT doc_id, CAST(max(n) AS INT) AS n_samples, CAST(count(*) FILTER (WHERE dev * prev < 0) AS BIGINT) AS crossings FROM lg GROUP BY doc_id) " +
      "SELECT doc_id, n_samples, crossings, round(CAST(crossings AS DOUBLE) / (n_samples - 1), 6) AS zcr FROM c"))

  /** Audio silence trim ([[Multimodal.silenceTrim]]): WAV clips with
    * PLANTED leading (id%7) and trailing (id%5) exact-center silence
    * around an always-active band — the engine decodes real PCM8 and
    * scans samples; the oracle derives every trim from the planting
    * arithmetic alone (the mm-tier contract).
    */
  val mmAudioTrim = Q(
    (s, dir) => {
      import s.implicits._
      val blobs = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val n = (60 + id % 20).toInt
          val lead = (id % 7).toInt
          val trail = (id % 5).toInt
          val samples = Array.tabulate(n) { k =>
            if (k < lead || k >= n - trail) 128.toByte
            else (158 + (id + k) % 60).toByte
          }
          (id, Multimodal.encodeWavPcm8(samples, sampleRate = 8000))
        }.toDF("doc_id", "content")
      Multimodal.silenceTrim(blobs, "doc_id", "content", eps = 2)
    },
    Some("SELECT doc_id, CAST(60 + doc_id % 20 AS INT) AS n_samples, CAST(doc_id % 7 AS INT) AS lead_trim, CAST(doc_id % 5 AS INT) AS trail_trim, CAST(60 + doc_id % 20 - doc_id % 7 - doc_id % 5 AS INT) AS kept FROM documents"))

  /** Image metadata extraction ([[graft.multimodal.ImageMetadata
    * .imageMetadata]]): PNG tEXt/iTXt chunks and JPEG APP1/EXIF IFD0
    * tags walked from PLANTED provenance (keys/values pure functions
    * of doc_id), long format (doc_id, format, key, value). Every 13th
    * image carries a malformed metadata segment (overrun chunk/APP1
    * length) — the walker quarantines it to zero rows, which the
    * oracle mirrors by exclusion.
    */
  val mmExifMeta = Q(
    (s, dir) => {
      import s.implicits._
      val blobs = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val corrupt = id % 13 == 0
          val bytes =
            if (id % 2 == 0) {
              val base = Multimodal.encodeGrayPng(
                (8 + id % 8).toInt, (6 + id % 6).toInt,
                (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
              if (corrupt)
                // declared tEXt length overruns the file: walker stops
                base.take(33) ++ Array[Byte](0, 0, 0x27, 0x0f) ++
                  "tEXtxx".getBytes("US-ASCII")
              else graft.multimodal.ImageMetadata.pngAddText(base,
                Seq("Author" -> s"author_${id % 10}",
                  "Software" -> s"graft-${id % 4}"),
                Seq("Comment" -> s"c_${id % 6}"))
            } else {
              val base = Multimodal.encodeGrayJpeg(
                (8 + id % 8).toInt, (6 + id % 6).toInt,
                (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
              if (corrupt) Array[Byte](0xff.toByte, 0xd8.toByte,
                0xff.toByte, 0xe1.toByte, 0x7f, 0x00)
              else graft.multimodal.ImageMetadata.jpegAddExif(base,
                Seq(0x010f -> s"make_${id % 5}",
                  0x0110 -> s"model_${id % 7}"),
                Seq(0x0112 -> (1 + id % 8).toInt))
            }
          (id, bytes)
        }.toDF("doc_id", "content")
      graft.multimodal.ImageMetadata.imageMetadata(
        blobs, "doc_id", "content")
    },
    Some("WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 13 <> 0), " +
      "png AS (SELECT doc_id FROM ids WHERE doc_id % 2 = 0), " +
      "jpg AS (SELECT doc_id FROM ids WHERE doc_id % 2 = 1) " +
      "SELECT doc_id, 'png' AS format, 'Author' AS \"key\", 'author_' || (doc_id % 10) AS \"value\" FROM png " +
      "UNION ALL SELECT doc_id, 'png', 'Software', 'graft-' || (doc_id % 4) FROM png " +
      "UNION ALL SELECT doc_id, 'png', 'Comment', 'c_' || (doc_id % 6) FROM png " +
      "UNION ALL SELECT doc_id, 'jpeg', 'Make', 'make_' || (doc_id % 5) FROM jpg " +
      "UNION ALL SELECT doc_id, 'jpeg', 'Model', 'model_' || (doc_id % 7) FROM jpg " +
      "UNION ALL SELECT doc_id, 'jpeg', 'Orientation', CAST(1 + doc_id % 8 AS VARCHAR) FROM jpg"))

  /** Multimodal image decode: REAL PNG containers decoded with
    * javax.imageio via batch-shaped mapPartitions; the oracle re-derives
    * the decoded dimensions from the generator arithmetic.
    */
  val mmDecodeMeta = Q(
    (s, dir) => Multimodal.decodeImageMeta(mmPngBlobs(s, dir), "doc_id", "content")
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("n_frames")),
    Some("SELECT doc_id, 'png' AS format, CAST(16 + doc_id % 16 AS INT) AS width, CAST(12 + doc_id % 8 AS INT) AS height, CAST(1 AS INT) AS n_frames FROM documents"))

  /** Multimodal JPEG decode: REAL JPEG containers (JVM-bundled encoder
    * and decoder) through the same batch-shaped decode path as PNG —
    * JPEG is lossy, so the entry pins exactly the container facts that
    * survive the codec (format sniff from the FF D8 FF magic, decoded
    * dimensions), which the oracle re-derives from the generator
    * arithmetic.
    */
  val mmJpegMeta = Q(
    (s, dir) => {
      val sess = s
      import sess.implicits._
      val blobs = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val w = (16 + id % 16).toInt
          val h = (12 + id % 8).toInt
          (id, Multimodal.encodeGrayJpeg(w, h,
            (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt))
        }.toDF("doc_id", "content")
      Multimodal.decodeImageMeta(blobs, "doc_id", "content")
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("n_frames"))
    },
    Some("SELECT doc_id, 'jpeg' AS format, CAST(16 + doc_id % 16 AS INT) AS width, CAST(12 + doc_id % 8 AS INT) AS height, CAST(1 AS INT) AS n_frames FROM documents"))

  /** Multimodal audio decode: REAL WAV containers decoded with
    * javax.sound.sampled (header + frame count).
    */
  val mmAudioMeta = Q(
    (s, dir) => Multimodal.decodeAudioMeta(mmWavBlobs(s, dir), "doc_id", "content"),
    Some("SELECT doc_id, 'wav' AS format, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels, CAST(100 + doc_id % 50 AS BIGINT) AS n_frames FROM documents"))

  /** REAL audio featurization: decode the WAV PCM samples, per-frame RMS
    * energy + zero-crossing count (the VAD/silence-filter features).
    * Samples are exact dyadic rationals, so Σx² is bit-exact in double
    * regardless of fold order and the oracle needs no rounding at all.
    */
  val mmAudioFeatures = Q(
    (s, dir) => Multimodal.audioFeatures(mmWavBlobs(s, dir), "doc_id",
      "content", frameSize = 50),
    Some("WITH d AS (SELECT doc_id, CAST(100 + doc_id % 50 AS INT) AS n FROM documents), pos AS (SELECT unnest(generate_series(0, 149)) AS k), s AS (SELECT doc_id, k, CAST((doc_id + k * 17) % 256 AS INT) AS sv, CAST(k // 50 AS INT) AS f FROM d JOIN pos ON k < (n // 50) * 50), x AS (SELECT doc_id, f, k % 50 AS kin, (sv - 128) / 128.0 AS xv, sv >= 128 AS sgn, lag(sv >= 128) OVER (PARTITION BY doc_id ORDER BY k) AS prev FROM s) SELECT doc_id, f AS frame_idx, sqrt(sum(xv * xv) / 50) AS rms, CAST(count(*) FILTER (WHERE kin > 0 AND sgn <> prev) AS INT) AS zc FROM x GROUP BY 1, 2"))

  /** Deterministic REAL Y4M video containers (monochrome plane, 8×4):
    * frame count and every plane byte are pure functions of doc_id
    * (`px(f, k) = (31·id + 7f + 13k) mod 256`), so the oracle re-derives
    * demuxed facts from the base table while the engine walks genuine
    * YUV4MPEG2 container bytes.
    */
  def mmY4mBlobs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long].map { id =>
      val f = (1 + id % 4).toInt
      (id, Multimodal.encodeY4mMono(8, 4, f,
        (fi, k) => ((id * 31 + fi * 7 + k * 13) % 256).toInt))
    }.toDF("doc_id", "content")
  }

  /** REAL video frame sampling ([[Multimodal.frameSampleVideo]]): demux
    * the Y4M container, keep every 2nd frame, and return each kept
    * frame's length AND unsigned byte sum — the byte sum proves the
    * demuxer returned the exact plane bytes at the exact offsets the
    * container declared, not an assumed fixed layout.
    */
  val mmFrameSample = Q(
    (s, dir) => {
      import s.implicits._
      Multimodal.frameSampleVideo(
          mmY4mBlobs(s, dir), "doc_id", "content", everyN = 2)
        .as[(Long, Int, Array[Byte])]
        .map { case (id, fi, frame) =>
          (id, fi, frame.length, frame.map(b => (b & 0xff).toLong).sum)
        }
        .toDF("doc_id", "frame_idx", "frame_len", "byte_sum")
        .withColumn("frame_len", col("frame_len").cast("int"))
    },
    Some("WITH d AS (SELECT doc_id, CAST(1 + doc_id % 4 AS INT) AS f FROM documents), fr AS (SELECT doc_id, CAST(i AS INT) AS frame_idx FROM d JOIN (SELECT unnest(generate_series(0, 3)) AS i) s ON i < f WHERE i % 2 = 0), px AS (SELECT doc_id, frame_idx, CAST(sum((doc_id * 31 + frame_idx * 7 + k * 13) % 256) AS BIGINT) AS byte_sum FROM fr CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS k) g GROUP BY 1, 2) SELECT doc_id, frame_idx, CAST(32 AS INT) AS frame_len, byte_sum FROM px"))

  /** REAL video metadata ([[Multimodal.decodeVideoMeta]]): header fields
    * re-derived by the oracle from the generator arithmetic.
    */
  val mmVideoMeta = Q(
    (s, dir) => Multimodal.decodeVideoMeta(mmY4mBlobs(s, dir), "doc_id",
      "content"),
    Some("SELECT doc_id, 'y4m' AS format, CAST(8 AS INT) AS width, CAST(4 AS INT) AS height, 'mono' AS colorspace, CAST(1 + doc_id % 4 AS INT) AS n_frames FROM documents"))

  /** Deterministic REAL AVI (RIFF) containers: every frame payload byte
    * is a pure function of doc_id (`(37·id + 11·f + 5·k) mod 256`, 32
    * bytes per 8×4 DIB frame), so the oracle re-derives every demuxed
    * fact while the engine walks genuine RIFF chunk trees — LIST sizes,
    * even-byte padding, avih/strh parsing and all.
    */
  def mmAviBlobs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long].map { id =>
      val n = (1 + id % 3).toInt
      val frames = (0 until n).map { f =>
        Array.tabulate(32)(k => ((id * 37 + f * 11 + k * 5) % 256).toByte)
      }
      (id, Multimodal.encodeAvi(8, 4, "DIB ", frames))
    }.toDF("doc_id", "content")
  }

  /** REAL AVI metadata ([[Multimodal.demuxAvi]] via the dispatching
    * [[Multimodal.decodeVideoMeta]]): width/height from avih, codec
    * handler from strh, frame count from the movi walk cross-checked
    * against avih.
    */
  val mmAviMeta = Q(
    (s, dir) => Multimodal.decodeVideoMeta(mmAviBlobs(s, dir), "doc_id",
      "content"),
    Some("SELECT doc_id, 'avi' AS format, CAST(8 AS INT) AS width, CAST(4 AS INT) AS height, 'dib' AS colorspace, CAST(1 + doc_id % 3 AS INT) AS n_frames FROM documents"))

  /** REAL AVI frame sampling: the RIFF walk must surface each 00dc
    * chunk's exact payload bytes — the byte sum proves offsets came from
    * the container, not an assumed layout (the Y4M entry's contract,
    * on the second container format).
    */
  val mmAviFrameSample = Q(
    (s, dir) => {
      import s.implicits._
      Multimodal.frameSampleVideo(
          mmAviBlobs(s, dir), "doc_id", "content", everyN = 2)
        .as[(Long, Int, Array[Byte])]
        .map { case (id, fi, frame) =>
          (id, fi, frame.length, frame.map(b => (b & 0xff).toLong).sum)
        }
        .toDF("doc_id", "frame_idx", "frame_len", "byte_sum")
        .withColumn("frame_len", col("frame_len").cast("int"))
    },
    Some("WITH d AS (SELECT doc_id, CAST(1 + doc_id % 3 AS INT) AS f FROM documents), fr AS (SELECT doc_id, CAST(i AS INT) AS frame_idx FROM d JOIN (SELECT unnest(generate_series(0, 2)) AS i) s ON i < f WHERE i % 2 = 0), px AS (SELECT doc_id, frame_idx, CAST(sum((doc_id * 37 + frame_idx * 11 + k * 5) % 256) AS BIGINT) AS byte_sum FROM fr CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS k) g GROUP BY 1, 2) SELECT doc_id, frame_idx, CAST(32 AS INT) AS frame_len, byte_sum FROM px"))

  /** Scene-cut detection ([[Multimodal.sceneCuts]]) over the REAL AVI
    * corpus: mean absolute pixel delta between consecutive demuxed
    * frames vs an 8.0 threshold — the shot-boundary segmentation a
    * video-curation pipeline samples within. The oracle re-derives
    * every per-pixel delta from the frame generator arithmetic
    * (wraparound included); single-frame videos emit no pair on
    * either side.
    */
  val mmSceneCuts = Q(
    (s, dir) => Multimodal.sceneCuts(
      mmAviBlobs(s, dir), "doc_id", "content", threshold = 8.0),
    Some("WITH d AS (SELECT doc_id, CAST(1 + doc_id % 3 AS INT) AS f FROM documents), " +
      "fr AS (SELECT doc_id, i AS fi FROM d JOIN (SELECT unnest(generate_series(0, 1)) AS i) s ON i < f - 1), " +
      "del AS (SELECT doc_id, fi, round(CAST(sum(abs(((doc_id * 37 + (fi + 1) * 11 + k * 5) % 256) - ((doc_id * 37 + fi * 11 + k * 5) % 256))) AS DOUBLE) / 32, 4) AS mean_delta FROM fr CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS k) g GROUP BY 1, 2) " +
      "SELECT doc_id, CAST(fi AS INT) AS frame_idx, mean_delta, mean_delta >= 8.0 AS is_cut FROM del"))

  /** Shot-aware keyframe sampling ([[Multimodal.shotSample]]): frames
    * group into shots at the detected cuts and each shot emits its
    * first frame — the composite `mm_scene_cuts` exists for. The
    * oracle re-derives cuts from the generator arithmetic, assigns
    * shots by counting earlier cut starts, and folds keyframes.
    */
  val mmShotSample = Q(
    (s, dir) => Multimodal.shotSample(
      mmAviBlobs(s, dir), "doc_id", "content", threshold = 8.0),
    Some("WITH d AS (SELECT doc_id, CAST(1 + doc_id % 3 AS INT) AS f FROM documents), " +
      "fr AS (SELECT doc_id, i AS fi FROM d JOIN (SELECT unnest(generate_series(0, 2)) AS i) s ON i < f), " +
      "pr AS (SELECT doc_id, i AS fi FROM d JOIN (SELECT unnest(generate_series(0, 1)) AS i) s ON i < f - 1), " +
      "del AS (SELECT doc_id, fi, CAST(sum(abs(((doc_id * 37 + (fi + 1) * 11 + k * 5) % 256) - ((doc_id * 37 + fi * 11 + k * 5) % 256))) AS DOUBLE) / 32 AS mean_delta FROM pr CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS k) g GROUP BY 1, 2), " +
      "cuts AS (SELECT doc_id, fi + 1 AS start_fi FROM del WHERE round(mean_delta, 4) >= 8.0), " +
      "sh AS (SELECT fr.doc_id, fr.fi, count(c.start_fi) AS shot FROM fr LEFT JOIN cuts c ON c.doc_id = fr.doc_id AND c.start_fi <= fr.fi GROUP BY 1, 2) " +
      "SELECT doc_id, shot, CAST(min(fi) AS INT) AS keyframe_idx, count(*) AS n_frames FROM sh GROUP BY 1, 2"))

  /** REAL image resize: decode the PNG raster, nearest-neighbor resample
    * to a fixed 8×8 grid, emit the resampled gray levels exploded as
    * (doc_id, k, px) scalar rows. The oracle recomputes each output pixel
    * from the generator arithmetic at the NN source coordinates
    * `(⌊ox·w/8⌋, ⌊oy·h/8⌋)`.
    */
  val mmResize = Q(
    (s, dir) => Multimodal.resizeImage(mmPngBlobs(s, dir), "doc_id", "content",
        outW = 8, outH = 8)
      .select(col("doc_id"), col("width"), col("height"),
        posexplode(col("resized")).as(Seq("k", "px")))
      .select(col("doc_id"), col("width"), col("height"),
        col("k").cast("int").as("k"), col("px")),
    Some("WITH d AS (SELECT doc_id, CAST(16 + doc_id % 16 AS INT) AS w, CAST(12 + doc_id % 8 AS INT) AS h FROM documents), idx AS (SELECT unnest(generate_series(0, 63)) AS k) SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height, CAST(k AS INT) AS k, CAST((doc_id * 31 + (((k % 8) * w) // 8) * 7 + (((k // 8) * h) // 8) * 13) % 256 AS INT) AS px FROM d CROSS JOIN idx"))

  /** REAL image featurizer: decode the PNG raster, 16-bin gray-level
    * histogram L1-normalized by pixel count, emitted exploded as
    * (doc_id, bin, value) scalar rows — vector columns can't be
    * hash-compared by the harness, and the exploded form is the exact
    * child-table shape a feature store would use. The oracle recomputes
    * every pixel from the generator arithmetic; its position series is
    * bounded at 1023 (> max w·h = 31·19 = 589) because the driver's
    * DuckDB build lacks lateral generate_series over a column bound.
    * Integer counts divided in IEEE double are bit-identical across
    * engines.
    */
  val mmFeaturize = Q(
    (s, dir) => Multimodal.featurizeImage(mmPngBlobs(s, dir), "doc_id",
        "content", bins = 16)
      .select(col("doc_id"), posexplode(col("features")).as(Seq("bin", "value")))
      .select(col("doc_id"), col("bin").cast("int").as("bin"), col("value")),
    Some("WITH d AS (SELECT doc_id, CAST(16 + doc_id % 16 AS INT) AS w, CAST(12 + doc_id % 8 AS INT) AS h FROM documents), pos AS (SELECT unnest(generate_series(0, 1023)) AS i), px AS (SELECT doc_id, w, h, (doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256 AS v FROM d JOIN pos ON i < w * h), cnt AS (SELECT doc_id, v // 16 AS bin, count(*) AS n FROM px GROUP BY 1, 2), bins AS (SELECT unnest(generate_series(0, 15)) AS bin) SELECT d.doc_id, CAST(bins.bin AS INT) AS bin, CAST(COALESCE(cnt.n, 0) AS DOUBLE) / (d.w * d.h) AS value FROM d CROSS JOIN bins LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.bin = bins.bin"))

  /** dHash perceptual fingerprints over the REAL PNG corpus
    * ([[Multimodal.dhashImage]]): the engine decodes genuine PNG bytes
    * and resamples with the resizeImage floor arithmetic; the oracle
    * re-derives every gradient bit from the generator's pixel function.
    * Rendered as the 64-char bit string (MSB first — string position 1 is
    * long bit 63), the same cross-engine form the SimHash entries use.
    */
  val mmImageDhash = Q(
    (s, dir) => Multimodal.dhashImage(mmPngBlobs(s, dir), "doc_id", "content")
      .select(col("id").as("doc_id"),
        lpad(bin(col("fp")), 64, "0").as("dhash")),
    Some("WITH d AS (SELECT doc_id, CAST(16 + doc_id % 16 AS INT) AS w, CAST(12 + doc_id % 8 AS INT) AS h FROM documents), b0 AS (SELECT doc_id, i, (i % 8) * w // 9 AS xl, ((i % 8) + 1) * w // 9 AS xr, (i // 8) * h // 8 AS sy FROM d CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) s), b AS (SELECT doc_id, i, CASE WHEN (doc_id * 31 + xl * 7 + sy * 13) % 256 > (doc_id * 31 + xr * 7 + sy * 13) % 256 THEN '1' ELSE '0' END AS bit FROM b0) SELECT doc_id, string_agg(bit, '' ORDER BY i) AS dhash FROM b GROUP BY doc_id"))

  /** PNG corpus with PLANTED image near-duplicates: 64 base patterns
    * (`doc_id % 64` keys the pixel function), each doc perturbing its
    * group's pattern at the ~`w·h/101` pixels selected by `doc_id / 64`
    * (+128 gray shift — big enough to flip a sampled gradient). Docs in
    * one group are near-identical images differing in a few dHash bits;
    * cross-group images differ in ~half the bits.
    */
  def mmNearDupPngBlobs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long].map { id =>
      val g = id % 64
      val w = (16 + g % 9).toInt
      val h = (12 + g % 7).toInt
      val sel = (id / 64) % 101
      // (x+g)(y+2g+3) keys the gradient STRUCTURE off the group — a
      // group-constant offset alone would be invisible to dHash (the
      // hash is brightness-invariant by design) and collapse all groups
      // into one near-dup blob
      (id, Multimodal.encodeGrayPng(w, h, (x, y) =>
        (((x + g) * (y + 2 * g + 3) * 7 + x * 11 +
          (if ((x * 31 + y * 17) % 101 == sel) 128 else 0)) % 256).toInt))
    }.toDF("doc_id", "content")
  }

  /** Image near-dup pairs: REAL PNG decode → dHash → the SimHash
    * block-permutation band join ([[SimHash.nearPairsFromFingerprints]] —
    * 8 blocks of 8 bits for radius 7, candidates from block-bucket
    * collisions, never all pairs). The oracle brute-forces the full
    * pair matrix over hashes re-derived from the generator arithmetic,
    * so banding can hide nothing.
    */
  val mmImageNeardup = Q(
    (s, dir) => SimHash.nearPairsFromFingerprints(
      EntriesDedup.sharedStage(s, "dhash_neardup_fp", dir)(
        Multimodal.dhashImage(mmNearDupPngBlobs(s, dir), "doc_id", "content")),
      maxDist = 7, bits = 64),
    Some("WITH d AS (SELECT doc_id, doc_id % 64 AS g, CAST(16 + (doc_id % 64) % 9 AS INT) AS w, CAST(12 + (doc_id % 64) % 7 AS INT) AS h, (doc_id // 64) % 101 AS sel FROM documents), b0 AS (SELECT doc_id, g, sel, i, (i % 8) * w // 9 AS xl, ((i % 8) + 1) * w // 9 AS xr, (i // 8) * h // 8 AS sy FROM d CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) s), b AS (SELECT doc_id, i, CASE WHEN ((xl + g) * (sy + 2 * g + 3) * 7 + xl * 11 + CASE WHEN (xl * 31 + sy * 17) % 101 = sel THEN 128 ELSE 0 END) % 256 > ((xr + g) * (sy + 2 * g + 3) * 7 + xr * 11 + CASE WHEN (xr * 31 + sy * 17) % 101 = sel THEN 128 ELSE 0 END) % 256 THEN '1' ELSE '0' END AS bit FROM b0), fp AS (SELECT doc_id, string_agg(bit, '' ORDER BY i) AS f FROM b GROUP BY doc_id), p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, a.f AS f1, b.f AS f2 FROM fp a JOIN fp b ON a.doc_id < b.doc_id), dd AS (SELECT id1, id2, count(*) FILTER (WHERE substr(f1, CAST(i AS INT), 1) <> substr(f2, CAST(i AS INT), 1)) AS dist FROM p CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) s GROUP BY 1, 2) SELECT id1, id2, CAST(dist AS INT) AS dist FROM dd WHERE dist <= 7"))

  /** Perceptual audio fingerprints ([[Multimodal.audioFingerprint]])
    * over the REAL WAV corpus: genuine `javax.sound.sampled` decode,
    * integer frame-energy gradient signs; the oracle re-derives every
    * frame sum and comparison from the PCM generator arithmetic.
    */
  val mmAudioFp = Q(
    (s, dir) => Multimodal.audioFingerprint(mmWavBlobs(s, dir), "doc_id",
        "content")
      .select(col("id").as("doc_id"), lpad(bin(col("fp")), 64, "0").as("afp")),
    Some("WITH d AS (SELECT doc_id, CAST(100 + doc_id % 50 AS INT) AS n FROM documents), sm AS (SELECT doc_id, i, (doc_id + i * 17) % 256 AS v, i * 65 // n AS f FROM d JOIN (SELECT unnest(generate_series(0, 148)) AS i) s ON i < n), e AS (SELECT doc_id, f, sum(v) AS e FROM sm GROUP BY 1, 2), b AS (SELECT x.doc_id, x.f AS k, CASE WHEN x.e > y.e THEN '1' ELSE '0' END AS bit FROM e x JOIN e y ON x.doc_id = y.doc_id AND y.f = x.f + 1) SELECT doc_id, string_agg(bit, '' ORDER BY k) AS afp FROM b GROUP BY doc_id"))

  /** WAV corpus with PLANTED audio near-duplicates: 48 base waveforms
    * (quadratic phase keyed off `doc_id % 48` so groups differ in
    * gradient STRUCTURE, not just level), each doc level-shifting the
    * ~n/37 samples selected by `doc_id / 48` — a few frame energies
    * move, a few bits flip.
    */
  def mmNearDupWavBlobs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long].map { id =>
      val g = id % 48
      val n = (120 + g % 30).toInt
      val sel = (id / 48) % 37
      val samples = Array.tabulate(n) { k =>
        (((k.toLong * k * 3 + k * (g + 5) + g * 29) % 256 +
          (if (k % 37 == sel) 64 else 0)) % 256).toByte
      }
      (id, Multimodal.encodeWavPcm8(samples, sampleRate = 8000))
    }.toDF("doc_id", "content")
  }

  /** Audio near-dup pairs: REAL WAV decode → energy fingerprint → the
    * same block-permutation band join the image and text paths use —
    * one Hamming machinery, three modalities. Brute-force all-pairs
    * oracle over hashes re-derived from the generator arithmetic.
    */
  val mmAudioNeardup = Q(
    (s, dir) => SimHash.nearPairsFromFingerprints(
      Multimodal.audioFingerprint(mmNearDupWavBlobs(s, dir), "doc_id",
        "content"),
      maxDist = 7, bits = 64),
    Some("WITH d AS (SELECT doc_id, doc_id % 48 AS g, CAST(120 + (doc_id % 48) % 30 AS INT) AS n, (doc_id // 48) % 37 AS sel FROM documents), sm AS (SELECT doc_id, i, ((i * i * 3 + i * (g + 5) + g * 29) % 256 + CASE WHEN i % 37 = sel THEN 64 ELSE 0 END) % 256 AS v, i * 65 // n AS f FROM d JOIN (SELECT unnest(generate_series(0, 149)) AS i) s ON i < n), e AS (SELECT doc_id, f, sum(v) AS e FROM sm GROUP BY 1, 2), bb AS (SELECT x.doc_id, x.f AS k, CASE WHEN x.e > y.e THEN '1' ELSE '0' END AS bit FROM e x JOIN e y ON x.doc_id = y.doc_id AND y.f = x.f + 1), fp AS (SELECT doc_id, string_agg(bit, '' ORDER BY k) AS fp FROM bb GROUP BY doc_id), p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, a.fp AS f1, b.fp AS f2 FROM fp a JOIN fp b ON a.doc_id < b.doc_id), dd AS (SELECT id1, id2, count(*) FILTER (WHERE substr(f1, CAST(i AS INT), 1) <> substr(f2, CAST(i AS INT), 1)) AS dist FROM p CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) s GROUP BY 1, 2) SELECT id1, id2, CAST(dist AS INT) AS dist FROM dd WHERE dist <= 7"))

  /** V7 — semi-structured extraction: parse the JSON props payload with
    * an explicit schema (`from_json` — schema-applied, columnar, no
    * schema inference pass) and filter on the extracted field. The
    * per-record JSON payload is the reference's bread and butter; this is
    * the column-level form (whole-file JSON goes through S2/relationalize).
    */
  val v7JsonExtract = Q(
    (s, dir) => t(s, dir, "events")
      .select(col("event_id"),
        from_json(col("props"), StructType.fromDDL("k bigint"))
          .getField("k").as("k"))
      .where(col("k") >= 50),
    Some("SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50"))

  /** SO5 — intersect / except over key sets (both DISTINCT set semantics),
    * emitted as one tagged union so a single entry covers both ops.
    */
  val so5IntersectExcept = Q(
    (s, dir) => {
      val big = t(s, dir, "orders").where(col("o_totalprice") > 150000.0)
        .select(col("o_custkey"))
      val open = t(s, dir, "orders").where(col("o_orderstatus") === "O")
        .select(col("o_custkey"))
      big.intersect(open).select(col("o_custkey"), lit("both").as("src"))
        .unionByName(
          big.except(open).select(col("o_custkey"), lit("only_big").as("src")))
    },
    Some("WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0), open_o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') SELECT o_custkey, 'both' AS src FROM (SELECT o_custkey FROM big INTERSECT SELECT o_custkey FROM open_o) UNION ALL SELECT o_custkey, 'only_big' AS src FROM (SELECT o_custkey FROM big EXCEPT SELECT o_custkey FROM open_o)"))

  /** Deterministic corpus shuffle + sharding ([[graft.operators
    * .Shuffle.deterministicShard]]): the write-side order a training
    * run consumes — seeded md5 rank de-correlates examples from ingest
    * order and fixes both shard membership and within-shard position
    * across retries (SO6's no-RNG convention extended from split
    * assignment to full ordering). Shard = first hex nibble (16
    * balanced buckets; the nibble count is the 100 TB scale valve),
    * pos = rank of the hash within the shard — a PARTITIONED window,
    * never a global sort.
    */
  val corpusShuffleShard = Q(
    (s, dir) => graft.operators.Shuffle.deterministicShard(
      t(s, dir, "documents").select(col("doc_id")), "doc_id",
      seed = "r10", nibbles = 1),
    Some("WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':r10') AS hh FROM documents) " +
      "SELECT doc_id, substr(hh, 1, 1) AS shard, CAST(row_number() OVER (PARTITION BY substr(hh, 1, 1) ORDER BY hh, doc_id) AS BIGINT) AS pos FROM h"))

  /** SO6 — deterministic hash split (train/val/test assignment, the
    * standard training-data partitioner): bucket by the first hex digit
    * of md5(id) — 12/2/2 of 16 digits ≈ 75/12.5/12.5 — so membership is
    * a pure function of the key: stable across runs, retries, cluster
    * sizes, and engines (md5 hex strings compare identically in Spark
    * and DuckDB), with no RNG state and no sampling shuffle. A narrow
    * projection — the split never moves data.
    */
  val so6HashSplit = Q(
    (s, dir) => {
      val d = substring(md5(col("doc_id").cast("string")), 1, 1)
      t(s, dir, "documents").select(col("doc_id"),
        when(d <= "b", "train").when(d <= "d", "val")
          .otherwise("test").as("split"))
    },
    Some("SELECT doc_id, CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train' WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val' ELSE 'test' END AS split FROM documents"))

  /** Exact-quota stratified split ([[graft.operators.Mixture
    * .stratifiedExactSplit]]): 80/10/10 per LANGUAGE with exact
    * per-stratum ceilings — the guarantee `so6_hash_split`'s
    * md5-threshold routing only approximates (binomial drift on small
    * strata). Oracle replays the seeded rank and both cumulative
    * boundaries.
    */
  val so16StratifiedSplit = Q(
    (s, dir) => graft.operators.Mixture.stratifiedExactSplit(
      t(s, dir, "documents"), "doc_id", "lang",
      fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      seed = "sp1"),
    Some("WITH r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR) || ':sp1'), doc_id) AS rk, count(*) OVER (PARTITION BY lang) AS n FROM documents) " +
      "SELECT doc_id, lang, CASE WHEN rk <= ceil(round(0.8 * n, 9)) THEN 'train' WHEN rk <= ceil(round(0.9 * n, 9)) THEN 'val' ELSE 'test' END AS split FROM r"))

  /** Overlapping chunking ([[TextAnalysis.chunks]]): 40-token windows
    * with 10-token overlap, exploded to the (doc, chunk_idx, chunk)
    * child-table shape — the RAG-ingestion / long-document splitter.
    * Pure column expressions; the oracle re-derives every window with
    * the same slice arithmetic.
    */
  val textChunks = Q(
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__ts"))
      .select(col("doc_id"),
        posexplode(TextAnalysis.chunksOfTokens(col("__ts"), size = 40,
          overlap = 10)).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        col("chunk")),
    Some("WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents), k AS (SELECT doc_id, ws, greatest(1, CAST(ceil((len(ws) - 10) / 30.0) AS BIGINT)) AS nk FROM d), i AS (SELECT doc_id, ws, unnest(generate_series(0, nk - 1)) AS ci FROM k) SELECT doc_id, CAST(ci AS INT) AS chunk_idx, array_to_string(ws[(ci*30+1):(ci*30+40)], ' ') AS chunk FROM i"))

  /** SO8 — deterministic k-per-group cap sampling (quota sampling: "at
    * most 30 documents per language", the cap complement of SO7's
    * rates). Rank within each group by an md5 hash of the row key —
    * a uniform-but-deterministic order, so the keep-set is identical on
    * every retry — via the TWO-PHASE salted rank
    * ([[Salted.topKPerGroup]]): a handful of coarse strata must never
    * serialize the whole corpus through a few window tasks. Groups under
    * the cap pass through whole; the oracle is the equivalent
    * single-phase window.
    */
  val so8SampleKPerGroup = Q(
    (s, dir) => Salted.topKPerGroup(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        groupCols = Seq("lang"),
        orderCols = Seq(md5(col("doc_id").cast("string")), col("doc_id")),
        k = 30)
      .select(col("doc_id"), col("lang"), col("rk").cast("int").as("rk")),
    Some("SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM documents) WHERE rk <= 30"))

  /** BM25 retrieval scoring ([[TextAnalysis.bm25TopK]]): top-20 documents
    * for a 3-term query — the relevance scorer behind "keep documents
    * that look like the target domain" corpus filtering. Postings filter
    * to the query terms before any shuffle; idf quantized to 9 decimals
    * (ln bits differ across engines by an ulp), score to 4. Oracle
    * recomputes the same BM25 arithmetic over the same token postings.
    */
  val textBm25 = Q(
    (s, dir) => TextAnalysis.bm25TopK(
      t(s, dir, "documents"), "doc_id", "text",
      terms = Seq("vector", "hash", "scan"), k = 20),
    Some("WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents), st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(CAST(len(ws) AS DOUBLE)) AS avgdl FROM d), tk AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, unnest(ws) AS w FROM d), tf AS (SELECT doc_id, dl, w, CAST(count(*) AS DOUBLE) AS tf FROM tk WHERE w IN ('vector', 'hash', 'scan') GROUP BY 1, 2, 3), idf AS (SELECT w, round(ln((st.n - CAST(count(DISTINCT doc_id) AS DOUBLE) + 0.5) / (CAST(count(DISTINCT doc_id) AS DOUBLE) + 0.5) + 1.0), 9) AS idf FROM tf, st GROUP BY w, st.n), sc AS (SELECT doc_id, round(sum(idf.idf * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / st.avgdl))), 4) AS score FROM tf JOIN idf USING (w), st GROUP BY 1), r AS (SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM sc) SELECT doc_id, CAST(rank AS INT) AS rank, score FROM r WHERE rank <= 20"))

  /** Flesch readability ([[TextAnalysis.readability]]): per-document
    * reading-ease from whitespace words, `[.!?]+` sentences, and
    * vowel-group syllables — the dictionary-free filter signal, fully
    * re-derived in SQL (regexp_extract_all mirrors regexp_count).
    */
  val textReadability = Q(
    (s, dir) => TextAnalysis.readability(
      t(s, dir, "documents"), "doc_id", "text"),
    Some("WITH b AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), w -> w <> '') AS ws, " +
      "greatest(1, CAST(len(list_filter(string_split_regex(text, '[.!?]+'), x -> trim(x) <> '')) AS BIGINT)) AS n_sentences FROM documents), " +
      "c AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, n_sentences, " +
      "CAST(coalesce(list_sum(list_transform(ws, w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))), 0) AS BIGINT) AS n_syllables FROM b) " +
      "SELECT doc_id, n_words, n_sentences, n_syllables, " +
      "CASE WHEN n_words > 0 THEN round(206.835 - 1.015 * n_words / n_sentences - 84.6 * n_syllables / n_words, 4) END AS flesch FROM c"))

  /** Sitemap parsing ([[graft.text.Sitemap.entries]]): per-source
    * synthesized `<urlset>` documents (one `<url>` per doc with
    * loc/lastmod/priority from doc_id arithmetic) parsed through the
    * doctype-disallowing SAX walk — robots.txt's companion politeness
    * file, the frontier-seeding half of the crawl loop. The oracle
    * re-derives every entry from the generator arithmetic; index
    * documents and malformed XML are MultimodalSpec-style spec
    * territory.
    */
  val webSitemapParse = Q(
    (s, dir) => {
      val sm = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          concat(lit("<url><loc>http://"), col("source"),
            lit(".example.com/doc/"), col("doc_id"),
            lit("</loc><lastmod>2024-01-"),
            lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
            lit("</lastmod><priority>0."),
            (col("doc_id") % 10).cast("string"),
            lit("</priority></url>")).as("e"))
        .groupBy(col("source"))
        .agg(concat(lit("<urlset>"),
          array_join(transform(
            sort_array(collect_list(struct(col("doc_id"), col("e")))),
            x => x("e")), ""),
          lit("</urlset>")).as("xml"))
      graft.text.Sitemap.entries(sm, "source", "xml")
    },
    Some("SELECT source, 'url' AS kind, 'http://' || source || '.example.com/doc/' || doc_id AS loc, " +
      "'2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod, " +
      "CAST('0.' || CAST(doc_id % 10 AS VARCHAR) AS DOUBLE) AS priority FROM documents"))

  /** Cross-document sentence dedup ([[TextAnalysis.dedupSentences]]):
    * the CCNet granularity — corpus-wide first occurrence per
    * sentence, tested over a fixture with PLANTED shared sentences
    * (doc_id % 3 / % 5 residues append two template sentences, the
    * syndication-footer shape) so cross-document removal genuinely
    * engages beyond the corpus's natural whole-text duplicates. The
    * oracle replays the split/trim/winner-window/rewrite chain.
    */
  val textDedupSentences = Q(
    (s, dir) => TextAnalysis.dedupSentences(
      t(s, dir, "documents").select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(". all rights reserved"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(". subscribe to the feed"))
          .otherwise(lit(""))).as("text")),
      "doc_id", "text"),
    Some("WITH aug AS (SELECT doc_id, text || CASE WHEN doc_id % 3 = 0 THEN '. all rights reserved' ELSE '' END || CASE WHEN doc_id % 5 = 0 THEN '. subscribe to the feed' ELSE '' END AS text FROM documents), " +
      "sp AS (SELECT doc_id, string_split_regex(text, '[.!?]+') AS arr FROM aug), " +
      "sent0 AS (SELECT doc_id, generate_subscripts(arr, 1) - 1 AS pos, trim(unnest(arr)) AS st FROM sp), " +
      "sent AS (SELECT * FROM sent0 WHERE st <> ''), " +
      "win AS (SELECT doc_id, pos, st, row_number() OVER (PARTITION BY st ORDER BY doc_id, pos) AS r FROM sent) " +
      "SELECT doc_id, COALESCE(string_agg(CASE WHEN r = 1 THEN st END, '. ' ORDER BY pos), '') AS text_deduped, " +
      "CAST(count(*) FILTER (WHERE r = 1) AS BIGINT) AS n_kept, " +
      "CAST(count(*) FILTER (WHERE r <> 1) AS BIGINT) AS n_removed FROM win GROUP BY doc_id"))

  /** License-header detection ([[TextAnalysis.licenseDetect]]): the
    * legal gate over a fixture with PLANTED headers — doc_id % 7
    * routes each document to one of the four license families (or
    * none), prepended verbatim; the engine matches the normative
    * phrases case-insensitively and the oracle re-derives every label
    * from the planting arithmetic alone.
    */
  val textLicenseDetect = Q(
    (s, dir) => TextAnalysis.licenseDetect(
      t(s, dir, "documents").select(col("doc_id"), concat(
        when(col("doc_id") % 7 === 1,
          lit("Permission is hereby granted, free of charge\n"))
          .when(col("doc_id") % 7 === 2,
            lit("Licensed under the Apache License, Version 2.0\n"))
          .when(col("doc_id") % 7 === 3,
            lit("GNU General Public License\n"))
          .when(col("doc_id") % 7 === 4,
            lit("Redistribution and use in source and binary forms\n"))
          .otherwise(lit("")),
        col("text")).as("text")),
      "doc_id", "text"),
    Some("SELECT doc_id, CASE doc_id % 7 WHEN 1 THEN 'MIT' WHEN 2 THEN 'Apache-2.0' WHEN 3 THEN 'GPL' WHEN 4 THEN 'BSD' END AS license, doc_id % 7 IN (1, 2, 3, 4) AS has_license FROM documents"))

  /** Corpus Zipf audit ([[TextAnalysis.zipfAudit]]): OLS fit of
    * ln(freq) on ln(rank) over the top-100 terms — slope ≈ −1 and high
    * r² is the natural-language fingerprint; template/log corpora bend
    * the line. One (term, count) aggregate + a TakeOrdered head; the
    * oracle replays the 9-quantized logs and the five regression sums.
    */
  val textZipfAudit = Q(
    (s, dir) => TextAnalysis.zipfAudit(
      t(s, dir, "documents"), "doc_id", "text", topN = 100),
    Some("WITH tf AS (SELECT w, count(*) AS f FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents) WHERE w <> '' GROUP BY 1), " +
      "tot AS (SELECT CAST(sum(f) AS BIGINT) AS total_tokens FROM tf), " +
      "top AS (SELECT f, row_number() OVER (ORDER BY f DESC, w) AS rk FROM tf ORDER BY f DESC, w LIMIT 100), " +
      "l AS (SELECT f, round(ln(rk), 9) AS x, round(ln(f), 9) AS y FROM top), " +
      "sm AS (SELECT CAST(count(*) AS INT) AS top_n, CAST(count(*) AS DOUBLE) AS n, sum(f) AS hf, sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy FROM l) " +
      "SELECT top_n, total_tokens, round(hf * 1.0 / total_tokens, 4) AS coverage, " +
      "round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 4) AS slope, " +
      "round((sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) * sx) / n, 4) AS intercept, " +
      "round((n * sxy - sx * sy) * (n * sxy - sx * sy) / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 4) AS r2 " +
      "FROM sm, tot"))

  /** k-anonymity audit ([[graft.operators.Privacy.kAnonymityAudit]]):
    * every (lang, source, length-bucket) quasi-identifier class with
    * its size and at-risk flag at k = 3 — the re-identification gate a
    * dataset release runs before publishing. The length bucket
    * (n_chars // 100) is the classic generalization step that trades
    * precision for class size; the fixture still leaves genuine
    * singleton classes, so the flag is exercised in both directions.
    */
  val privacyKAnon = Q(
    (s, dir) => graft.operators.Privacy.kAnonymityAudit(
      t(s, dir, "documents").select(col("lang"), col("source"),
        floor(col("n_chars") / 100).cast("long").as("len_bucket")),
      Seq("lang", "source", "len_bucket"), k = 3),
    Some("SELECT lang, source, n_chars // 100 AS len_bucket, CAST(count(*) AS BIGINT) AS group_n, count(*) < 3 AS at_risk FROM documents GROUP BY 1, 2, 3"))

  /** l-diversity audit ([[graft.operators.Privacy.lDiversityAudit]]):
    * the homogeneity-attack check on the SAME quasi-identifier grid as
    * `privacy_k_anon`, with the language as the sensitive attribute —
    * per class, distinct sensitive values, the modal value's share
    * (the adversary's posterior), and the l-gate flag.
    */
  val privacyLDiversity = Q(
    (s, dir) => graft.operators.Privacy.lDiversityAudit(
      t(s, dir, "documents").select(col("source"),
        floor(col("n_chars") / 100).cast("long").as("len_bucket"),
        col("lang")),
      Seq("source", "len_bucket"), "lang", l = 2),
    Some("WITH c AS (SELECT source, n_chars // 100 AS len_bucket, lang, count(*) AS c FROM documents GROUP BY 1, 2, 3) " +
      "SELECT source, len_bucket, CAST(sum(c) AS BIGINT) AS group_n, count(*) AS l_distinct, " +
      "round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_sensitive_frac, count(*) < 2 AS at_risk FROM c GROUP BY 1, 2"))

  /** t-closeness audit ([[graft.operators.Privacy.tClosenessAudit]]):
    * the distribution-skew gate on the SAME quasi-identifier grid as
    * `privacy_l_diversity` — per class, the total variation distance
    * between the class's language distribution and the corpus-wide one
    * (the attack l-diversity misses: l distinct values can still be
    * wildly over-represented vs their global base rates). The oracle
    * replays the absent-value-mass form of the TVD: ½(Σ_{v∈class}
    * |p_c−p_g| + 1 − Σ_{v∈class} p_g).
    */
  val privacyTCloseness = Q(
    (s, dir) => graft.operators.Privacy.tClosenessAudit(
      t(s, dir, "documents").select(col("source"),
        floor(col("n_chars") / 100).cast("long").as("len_bucket"),
        col("lang")),
      Seq("source", "len_bucket"), "lang", t = 0.2),
    Some("WITH cell AS (SELECT source, n_chars // 100 AS len_bucket, lang, CAST(count(*) AS DOUBLE) AS c FROM documents GROUP BY 1, 2, 3), " +
      "cl AS (SELECT source, len_bucket, sum(c) AS gn FROM cell GROUP BY 1, 2), " +
      "g AS (SELECT lang, CAST(count(*) AS DOUBLE) AS gc FROM documents GROUP BY 1), " +
      "tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents) " +
      "SELECT source, len_bucket, CAST(gn AS BIGINT) AS group_n, " +
      "round((sum(abs(c / gn - gc / n)) + 1.0 - sum(gc / n)) / 2, 4) AS tvd, " +
      "round((sum(abs(c / gn - gc / n)) + 1.0 - sum(gc / n)) / 2, 4) > 0.2 AS at_risk " +
      "FROM cell JOIN cl USING (source, len_bucket) JOIN g USING (lang), tot " +
      "GROUP BY source, len_bucket, gn"))

  /** Column profiling ([[graft.operators.Profile]]): per-column row/
    * null/distinct counts and min/max in ONE aggregation over one scan —
    * the post-conversion sanity report (count parity is the reference's
    * own acceptance check, etl-245). Oracle: per-column UNION ALL of the
    * same measures.
    */
  val profileTable = Q(
    (s, dir) => graft.operators.Profile.table(
      t(s, dir, "documents"), Seq("doc_id", "lang", "n_chars")),
    Some("SELECT 'doc_id' AS \"column\", count(*) AS n_rows, count(*) - count(doc_id) AS n_nulls, count(DISTINCT doc_id) AS n_distinct, CAST(min(doc_id) AS VARCHAR) AS min_str, CAST(max(doc_id) AS VARCHAR) AS max_str FROM documents UNION ALL SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang), CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM documents UNION ALL SELECT 'n_chars', count(*), count(*) - count(n_chars), count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents"))

  /** Curriculum staging ([[graft.operators.Mixture.curriculumStages]]):
    * per-language difficulty quartiles (char length as the difficulty
    * proxy) with the (score, id) tie-break — the easy→hard band
    * assignment a curriculum schedule consumes. Oracle re-derives the
    * ntile with the same ordering.
    */
  /** Weighted sampling without replacement
    * ([[graft.operators.Mixture.weightedSample]]): 100 documents drawn
    * with inclusion probability ∝ n_chars via the Efraimidis–Spirakis
    * key u^(1/w) on seeded md5 uniforms — the char-budget-proportional
    * subcorpus draw, RNG-free and retry-stable. The oracle replays the
    * key arithmetic ('0x'-cast of the same 8 md5 hex digits) and the
    * rounded-key rank.
    */
  val mixWeightedSample = Q(
    (s, dir) => graft.operators.Mixture.weightedSample(
      t(s, dir, "documents"), "doc_id", "n_chars", k = 100, seed = "es1"),
    Some("WITH b AS (SELECT doc_id, n_chars AS weight, round(pow(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':es1'), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0, 1.0 / n_chars), 9) AS es_key FROM documents WHERE n_chars > 0), " +
      "r AS (SELECT doc_id, weight, es_key, row_number() OVER (ORDER BY es_key DESC, doc_id) AS rk FROM b) " +
      "SELECT doc_id, weight, es_key, CAST(rk AS INT) AS rk FROM r WHERE rk <= 100"))

  val mixCurriculum = Q(
    (s, dir) => graft.operators.Mixture.curriculumStages(
      t(s, dir, "documents")
        .select(col("lang"), col("doc_id"), length(col("text")).as("d")),
      "lang", "doc_id", "d", stages = 4),
    Some("SELECT lang, doc_id, CAST(length(text) AS DOUBLE) AS score, CAST(ntile(4) OVER (PARTITION BY lang ORDER BY CAST(length(text) AS DOUBLE), doc_id) AS INT) AS stage FROM documents"))

  /** Deterministic bootstrap CI ([[graft.operators.Resample
    * .bootstrapCI]]): 40 md5-coin half-sample replicates of the mean
    * document length, collapsed to (mean, p5, p95) — reproducible
    * error bars for corpus metrics. The oracle replays every replicate
    * coin and the quantile_cont fold.
    */
  val evalBootstrapCI = Q(
    (s, dir) => graft.operators.Resample.bootstrapCI(
      t(s, dir, "documents"), "doc_id", "n_chars", reps = 40),
    Some("WITH b AS (SELECT unnest(range(40)) AS b), " +
      "k AS (SELECT b.b, CAST(d.n_chars AS DOUBLE) AS v FROM documents d CROSS JOIN b WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(b.b AS VARCHAR)), 1, 1) < '8'), " +
      "m AS (SELECT b, avg(v) AS m FROM k GROUP BY 1) " +
      "SELECT count(*) AS n_reps, round(avg(m), 6) AS mean, round(quantile_cont(m, 0.05), 6) AS ci_lo, round(quantile_cont(m, 0.95), 6) AS ci_hi FROM m"))

  /** Key-skew audit ([[graft.operators.Profile.keySkew]]): the
    * shuffle-planning probe — max/mean key concentration and top-1/
    * top-10 row shares for a prospective join key, in one row. The
    * oracle re-derives the key histogram, the (count desc, key)
    * top-10 head, and every ratio.
    */
  val profileKeySkew = Q(
    (s, dir) => graft.operators.Profile.keySkew(
      t(s, dir, "events"), "user_id"),
    Some("WITH c AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1), " +
      "h AS (SELECT CAST(max(c) AS BIGINT) AS top1, CAST(sum(c) AS BIGINT) AS top10 FROM (SELECT c FROM c ORDER BY c DESC, k LIMIT 10)), " +
      "t AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys, CAST(max(c) AS BIGINT) AS max_key_rows FROM c) " +
      "SELECT n_rows, n_keys, max_key_rows, round(CAST(n_rows AS DOUBLE) / n_keys, 4) AS mean_key_rows, " +
      "round(CAST(max_key_rows AS DOUBLE) * n_keys / n_rows, 4) AS skew_ratio, " +
      "round(CAST(top1 AS DOUBLE) / n_rows, 6) AS top1_share, " +
      "round(CAST(top10 AS DOUBLE) / n_rows, 6) AS top10_share FROM t CROSS JOIN h"))

  /** SO7 — deterministic stratified sampling: per-stratum keep rates
    * driven by an md5 bucket of the row key (~50% of `en`, ~25% of every
    * other language) — a pure filter, no RNG state, no sampling shuffle,
    * identical keep-set on every retry/backfill. The hex-prefix
    * comparison (256 buckets) evaluates identically in both engines.
    */
  val so7StratifiedSample = Q(
    (s, dir) => {
      val h2 = substring(md5(col("doc_id").cast("string")), 1, 2)
      t(s, dir, "documents").select(col("doc_id"), col("lang"))
        .where(when(col("lang") === "en", h2 <= "7f").otherwise(h2 <= "3f"))
    },
    Some("SELECT doc_id, lang FROM documents WHERE CASE WHEN lang = 'en' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '7f' ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '3f' END"))

  /** E4 — incremental aggregate maintenance
    * ([[graft.operators.IncrementalAgg]]): the fact table arrives in two
    * waves, each pre-aggregated and additively merged into a maintained
    * per-flag aggregate table — the maintained table must equal the
    * full-history recompute (the oracle) without ever rescanning wave 1.
    * Quantities are integer-valued doubles, so the two-phase sums are
    * bit-exact against the single-pass oracle.
    */
  val e4IncrementalAgg = Q(
    (s, dir) => {
      val out = scratchPath("graft_e4").toString
      val li = t(s, dir, "lineitem")
      def wave(pred: org.apache.spark.sql.Column) = li.filter(pred)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("long").as("n_items"),
          sum(col("l_quantity")).as("total_qty"))
      Seq(wave(col("l_orderkey") % 2 === 0), wave(col("l_orderkey") % 2 === 1))
        .foreach(d => graft.operators.IncrementalAgg.mergeAdditive(
          s, s"$out/agg", d, Seq("l_returnflag"),
          Seq("n_items", "total_qty"), Seq("l_returnflag")))
      s.read.parquet(s"$out/agg")
        .select(col("l_returnflag"), col("n_items"), col("total_qty"))
    },
    Some("SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items, sum(l_quantity) AS total_qty FROM lineitem GROUP BY 1"))

  /** A14 — re-mergeable distinct-count sketch rollup (datasketches HLL
    * built-ins): per-(lang, day) sketches — the persisted pre-aggregate
    * a 100 TB warehouse materializes once per partition — unioned into
    * per-lang distinct counts WITHOUT revisiting rows. At these
    * cardinalities the sketch is in exact (coupon-list) mode, so the
    * oracle is the exact COUNT(DISTINCT); at scale the same plan
    * degrades to ±1.6% instead of degrading to a second full scan.
    */
  val a14SketchRollup = Q(
    (s, dir) => {
      val daily = t(s, dir, "documents")
        .withColumn("day", pmod(col("doc_id"), lit(7)))
        .groupBy(col("lang"), col("day"))
        .agg(hll_sketch_agg(col("doc_id")).as("sk"))
      daily.groupBy(col("lang"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
          .cast("long").as("n_distinct"))
    },
    Some("SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct FROM documents GROUP BY 1"))

  /** A13 — Misra–Gries heavy hitters ([[graft.operators.FrequentItems]]):
    * the bounded-memory frequent-items sketch for unbounded key spaces
    * (vocabularies, URLs). On this corpus the capacity exceeds the
    * distinct count, so the estimates are provably exact and the oracle
    * is the exact grouped count; FrequentItemsSpec pins the
    * approximation guarantee when capacity is undersized.
    */
  val a13HeavyHitters = Q(
    (s, dir) => graft.operators.FrequentItems.topItems(
      t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("w")),
      col("w"), capacity = 256),
    Some("SELECT w AS item, CAST(count(*) AS BIGINT) AS est FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents) GROUP BY 1 ORDER BY est DESC, item"))

  /** A13g — per-group heavy hitters: one bounded sketch per language
    * (domain vocabularies). Same exactness argument as a13.
    */
  val a13HeavyHittersGrouped = Q(
    (s, dir) => graft.operators.FrequentItems.topItemsPerGroup(
      t(s, dir, "documents")
        .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("w")),
      Seq("lang"), col("w"), capacity = 256),
    Some("SELECT lang, w AS item, CAST(count(*) AS BIGINT) AS est FROM (SELECT lang, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents) GROUP BY 1, 2 ORDER BY lang, est DESC, item"))

  /** J11 — salted skew join ([[graft.operators.SkewJoin]]): the
    * manufactured-finer-keys fix for a hot join key AQE cannot split
    * (SURVEY §4, LSH band lesson in join form). Pair-exact vs the plain
    * join — the oracle IS the plain join; SkewJoinSpec proves the hot
    * key spreads across salt values.
    */
  val j11SkewJoin = Q(
    (s, dir) => graft.operators.SkewJoin.inner(
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
      t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
      "o_custkey", "c_custkey", salts = 8),
    Some("SELECT o_orderkey, o_custkey, c_mktsegment FROM orders JOIN customer ON o_custkey = c_custkey"))

  /** Deterministic mixture interleaving ([[graft.operators.Mixture
    * .interleavePlan]]): the low-discrepancy schedule the token-budget
    * plan feeds — domain d's k-th document occupies budget slot
    * ⌈k / w_d⌉, so every prefix of the slot order matches the target
    * mixture within ±1 per domain. `fr` carries no weight and drops
    * (the curation default). The slot arithmetic is double division +
    * ceil computed bit-identically by both engines — the CONTRACT is
    * determinism of the schedule, which is what makes a training run
    * resumable mid-stream; there is deliberately no dense global
    * row_number (a corpus-scale single-task window).
    */
  val mixInterleave = Q(
    (s, dir) => graft.operators.Mixture.interleavePlan(
      t(s, dir, "documents").select(col("lang"), col("doc_id")),
      "lang", "doc_id",
      Map("en" -> 0.5, "zh" -> 0.2, "es" -> 0.15, "de" -> 0.1)),
    Some("WITH w AS (SELECT 'en' AS dom, 0.5 AS wt UNION ALL SELECT 'zh', 0.2 UNION ALL SELECT 'es', 0.15 UNION ALL SELECT 'de', 0.1), " +
      "d AS (SELECT lang, doc_id, CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS k, wt FROM documents JOIN w ON lang = dom) " +
      "SELECT lang, doc_id, k, CAST(ceil(k / wt) AS BIGINT) AS slot FROM d"))

  /** Epoch expansion of the token-budget plan ([[graft.operators
    * .Mixture.epochExpand]]): the CONCRETE (doc, epoch) multiset behind
    * the plan's `epochs` column — full epochs for every document plus a
    * deterministic md5-ranked prefix as the final partial epoch (the
    * remainder-token cut). The oracle recomputes the plan arithmetic,
    * the rank, the exclusive running token sum, and both the full and
    * partial legs — a drifted cut boundary changes the row set.
    */
  val mixEpochExpand = Q(
    (s, dir) => graft.operators.Mixture.epochExpand(
      t(s, dir, "documents").select(col("lang"), col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long")
          .as("n_tokens")),
      "lang", "doc_id", "n_tokens",
      Map("en" -> 0.5, "zh" -> 0.2, "es" -> 0.15, "de" -> 0.1),
      budget = 100000L),
    Some("WITH tok AS (SELECT lang, doc_id, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n FROM documents), " +
      "av AS (SELECT lang, CAST(sum(n) AS BIGINT) AS available FROM tok GROUP BY 1), " +
      "w AS (SELECT 'en' AS dom, 0.5 AS wt UNION ALL SELECT 'zh', 0.2 UNION ALL SELECT 'es', 0.15 UNION ALL SELECT 'de', 0.1), " +
      "d AS (SELECT lang, available, CAST(floor(COALESCE(wt, 0.0) * 100000 + 0.5) AS BIGINT) AS desired FROM av LEFT JOIN w ON av.lang = w.dom), " +
      "pl AS (SELECT lang, CASE WHEN available = 0 OR desired = 0 THEN 0 ELSE desired // available END AS fullep, CASE WHEN available = 0 THEN 0 ELSE desired - (CASE WHEN desired = 0 THEN 0 ELSE desired // available END) * available END AS rem FROM d), " +
      "rk AS (SELECT lang, doc_id, n, md5(CAST(doc_id AS VARCHAR) || ':' || lang) AS h FROM tok), " +
      "cm AS (SELECT lang, doc_id, COALESCE(sum(n) OVER (PARTITION BY lang ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM rk), " +
      "j AS (SELECT cm.lang, cm.doc_id, cm.cum, pl.fullep, pl.rem FROM cm JOIN pl USING (lang)) " +
      "SELECT lang, doc_id, CAST(unnest(generate_series(1, fullep)) AS BIGINT) AS epoch FROM j WHERE fullep >= 1 " +
      "UNION ALL SELECT lang, doc_id, fullep + 1 AS epoch FROM j WHERE cum < rem"))

  /** Temperature-based domain mixture ([[graft.operators.Mixture]]):
    * a 300-document training mix at α = 0.5 — low-resource languages
    * upweighted relative to natural frequency, quotas capped at
    * availability, rows chosen by deterministic md5 rank (salted
    * bounded windows, never one task per domain). The domain table is
    * the only driver-held state. Oracle recomputes quota arithmetic and
    * rank prefix; at these counts every quota sits ≥0.04 from its
    * rounding boundary, so cross-engine pow ulps cannot flip a floor.
    */
  val mixTemperatureSample = Q(
    (s, dir) => graft.operators.Mixture.sample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", alpha = 0.5, budget = 300)
      .select(col("doc_id"), col("lang"), col("rk").cast("int").as("rk")),
    Some("WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1), z AS (SELECT sum(power(CAST(n AS DOUBLE), 0.5)) AS z FROM c), q AS (SELECT lang, least(n, CAST(floor(300.0 * power(CAST(n AS DOUBLE), 0.5) / z + 0.5) AS BIGINT)) AS quota FROM c, z), r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM documents) SELECT doc_id, r.lang AS lang, CAST(rk AS INT) AS rk FROM r JOIN q ON r.lang = q.lang WHERE rk <= quota"))

  /** Mixture-planning report: per language, document/token counts,
    * the natural token share, the α=0.5 temperature share over TOKEN
    * mass (the unit budgets are actually spent in — `mix_temperature
    * _sample` reweights doc counts; a fertility-skewed corpus makes
    * the two diverge, which is the point of reading them together),
    * and the implied up/down-sampling factor. One language-keyed
    * aggregate plus 1-row scalar folds.
    */
  val corpusMixtureReport = Q(
    (s, dir) => {
      val c = t(s, dir, "documents")
        .select(col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tk"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("n_tokens"))
      val tot = c.agg(sum(col("n_tokens")).as("__t"),
        sum(pow(col("n_tokens").cast("double"), 0.5)).as("__z"))
      c.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens") / col("__t"), 6).as("natural_share"),
          round(pow(col("n_tokens").cast("double"), 0.5) / col("__z"), 6)
            .as("temp_share"),
          round((pow(col("n_tokens").cast("double"), 0.5) / col("__z")) /
            (col("n_tokens") / col("__t")), 4).as("upsample"))
    },
    Some("WITH c AS (SELECT lang, count(*) AS n_docs, CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT) AS n_tokens FROM documents GROUP BY 1), " +
      "t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt, sum(power(CAST(n_tokens AS DOUBLE), 0.5)) AS z FROM c) " +
      "SELECT lang, n_docs, n_tokens, round(CAST(n_tokens AS DOUBLE) / tt, 6) AS natural_share, " +
      "round(power(CAST(n_tokens AS DOUBLE), 0.5) / z, 6) AS temp_share, " +
      "round((power(CAST(n_tokens AS DOUBLE), 0.5) / z) / (CAST(n_tokens AS DOUBLE) / tt), 4) AS upsample FROM c CROSS JOIN t"))

  /** Token-budget mixture plan ([[graft.operators.Mixture
    * .tokenBudgetPlan]]): per language, what the target mixture weights
    * want vs what the corpus holds — desired/planned tokens, acceptance
    * rate, and the repetition count (`epochs`) a full quota needs. The
    * planning table every pretraining run starts from; one domain-keyed
    * aggregate, weights a broadcast literal. `fr` is deliberately
    * absent from the weight map (plans to zero — exclusion is the
    * curation default, not an error).
    */
  val mixTokenBudget = Q(
    (s, dir) => graft.operators.Mixture.tokenBudgetPlan(
      t(s, dir, "documents").select(col("lang"),
        size(split(lower(trim(col("text"))), "\\s+")).as("n_tokens")),
      "lang", "n_tokens",
      Map("en" -> 0.5, "zh" -> 0.2, "es" -> 0.15, "de" -> 0.1),
      budget = 100000L),
    Some("WITH tok AS (SELECT lang, len(string_split_regex(lower(trim(text)), '\\s+')) AS n FROM documents), " +
      "av AS (SELECT lang, CAST(sum(n) AS BIGINT) AS available FROM tok GROUP BY 1), " +
      "w AS (SELECT 'en' AS dom, 0.5 AS wt UNION ALL SELECT 'zh', 0.2 UNION ALL SELECT 'es', 0.15 UNION ALL SELECT 'de', 0.1), " +
      "d AS (SELECT lang, available, CAST(floor(COALESCE(wt, 0.0) * 100000 + 0.5) AS BIGINT) AS desired FROM av LEFT JOIN w ON av.lang = w.dom) " +
      "SELECT lang, available, desired, least(desired, available) AS planned, " +
      "CASE WHEN available = 0 THEN 0.0 ELSE floor(CAST(least(desired, available) AS DOUBLE) / available * 10000.0 + 0.5) / 10000.0 END AS rate, " +
      "CASE WHEN available = 0 OR desired = 0 THEN 0 ELSE (desired + available - 1) // available END AS epochs FROM d"))

  /** SO10 — deterministic weighted sampling without replacement
    * ([[graft.operators.WeightedSample]], Efraimidis–Spirakis): 100
    * documents drawn proportional to length, keys derived from md5 so
    * every retry selects the identical sample. Plans as
    * TakeOrderedAndProject (asserted in WeightedSampleSpec) — never a
    * global sort. Oracle recomputes the same key arithmetic (the 1e12
    * floor-rounding convention absorbs cross-engine ln ulps).
    */
  val so10WeightedSample = Q(
    (s, dir) => graft.operators.WeightedSample.take(
        t(s, dir, "documents"), "doc_id", "n_chars", k = 100)
      .select(col("doc_id"), col("lang"), col("skey")),
    Some("SELECT doc_id, lang, skey FROM (SELECT doc_id, lang, floor(-ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1) / 4294967296.0) / CAST(n_chars AS DOUBLE) * 1e12 + 0.5) / 1e12 AS skey FROM documents) ORDER BY skey, doc_id LIMIT 100"))

  /** Sequence packing for LLM training ([[TextAnalysis.packSequences]]):
    * documents packed in id order into 256-token training rows across 8
    * independent pack groups — the distributed concat-and-chunk shape
    * (a global cumsum would serialize the corpus through one window
    * partition). Oracle recomputes the same exclusive-cumsum window
    * arithmetic.
    *
    * Oracle convention: DuckDB widens integer `sum(...)` and `//` to
    * HUGEINT (arrow decimal128), which hash-mismatches Spark's int64
    * even when values agree — every integer aggregate/division in a
    * final oracle SELECT must be wrapped in CAST(... AS BIGINT).
    */
  val textPackSequences = Q(
    (s, dir) => TextAnalysis.packSequences(
      t(s, dir, "documents"), "doc_id", "text", maxTokens = 256, groups = 8),
    Some("WITH tk AS (SELECT doc_id, doc_id % 8 AS grp, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS toks FROM documents), c AS (SELECT grp, doc_id, toks, COALESCE(sum(toks) OVER (PARTITION BY grp ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM tk) SELECT grp, CAST(cum // 256 AS BIGINT) AS seq, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens FROM c GROUP BY 1, 2"))

  /** Packing-efficiency audit ([[graft.text.TextAnalysis
    * .packEfficiency]]): per pack group, the fill rate (capped at the
    * budget so overhang can't inflate it), overhang and underfill
    * counts — the trainer-utilization readout over the same packing
    * the `text_pack_sequences` entry pins.
    */
  val textPackEfficiency = Q(
    (s, dir) => TextAnalysis.packEfficiency(
      t(s, dir, "documents"), "doc_id", "text", maxTokens = 256, groups = 8),
    Some("WITH tk AS (SELECT doc_id, doc_id % 8 AS grp, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS toks FROM documents), " +
      "c AS (SELECT grp, doc_id, toks, COALESCE(sum(toks) OVER (PARTITION BY grp ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM tk), " +
      "p AS (SELECT grp, cum // 256 AS seq, count(*) AS nd, sum(toks) AS nt FROM c GROUP BY 1, 2) " +
      "SELECT grp, count(*) AS n_seqs, CAST(sum(nd) AS BIGINT) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens, " +
      "round(CAST(sum(LEAST(nt, 256)) AS DOUBLE) / (count(*) * 256), 6) AS fill_rate, " +
      "CAST(sum(CASE WHEN nt > 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_overhang, " +
      "CAST(sum(CASE WHEN nt < 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_underfilled FROM p GROUP BY 1"))

  /** Per-language tokenizer fertility ([[graft.text.TextAnalysis
    * .tokenFertility]]): chars-per-token and subwords-per-token by
    * language — the audit that converts a token budget into the
    * mixture it actually buys across languages with different
    * tokenization costs.
    */
  val textTokenFertility = Q(
    (s, dir) => TextAnalysis.tokenFertility(
      t(s, dir, "documents"), "lang", "text"),
    Some("WITH c AS (SELECT lang, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS tk, CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS sw, CAST(length(text) AS BIGINT) AS ch FROM documents) " +
      "SELECT lang, count(*) AS n_docs, CAST(sum(tk) AS BIGINT) AS n_tokens, CAST(sum(sw) AS BIGINT) AS n_subwords, CAST(sum(ch) AS BIGINT) AS n_chars, " +
      "CASE WHEN sum(tk) > 0 THEN round(CAST(sum(ch) AS DOUBLE) / sum(tk), 4) END AS chars_per_token, " +
      "CASE WHEN sum(tk) > 0 THEN round(CAST(sum(sw) AS DOUBLE) / sum(tk), 4) END AS subwords_per_token FROM c GROUP BY 1"))

  /** BPE training pair statistics ([[graft.text.Bpe.pairStats]]): the
    * corpus-sized stage of BPE training — char-level (iteration-0)
    * adjacent-symbol pair counts over the word-frequency table,
    * deterministic top-50. This is the ONE driver-checkable slice of
    * the BPE pipeline: the full iterative merge loop ([[graft.text.Bpe
    * .train]]/`encodeTokens`/`encodeCounts`) is not SQL-expressible, so
    * it is intentionally NOT registered here — a registry row that can
    * never go green is worse than a spec-only operator — and BpeSpec
    * carries its verification (Sennrich golden merge sequence, greedy
    * encode, detokenize round-trip, in-memory/distributed parity).
    * The oracle re-derives the same char segmentation with list
    * arithmetic (ASCII corpus: DuckDB character slicing and JVM char
    * mapping agree).
    */
  val textBpePairStats = Q(
    (s, dir) => graft.text.Bpe.pairStats(t(s, dir, "documents"), "text", k = 50),
    Some("WITH w AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents) WHERE w <> '' GROUP BY w), sy AS (SELECT list_append(list_transform(generate_series(1, len(w)), i -> w[i:i]), '</w>') AS syms, c FROM w), p AS (SELECT syms[i] AS a, syms[i + 1] AS b, c FROM (SELECT syms, c, unnest(generate_series(1, len(syms) - 1)) AS i FROM sy)) SELECT a, b, CAST(sum(c) AS BIGINT) AS cnt FROM p GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 50"))

  /** Unigram-LM tokenizer training seed statistics ([[graft.text
    * .UnigramLm.seedStats]], Kudo 2018): positioned-substring counts
    * (length ≤ 4) over the word-frequency table, deterministic top-50 —
    * the corpus-sized stage of SentencePiece-style unigram training,
    * exactly the [[textBpePairStats]] pattern: the EM loop itself
    * ([[graft.text.UnigramLm.train]]/`viterbi`/`encodeTokens`) is not
    * SQL-expressible, so UnigramLmSpec carries it (hand-derived golden
    * EM sequence, driver/distributed parity, coverage-floor pruning,
    * Viterbi tie-breaks). The oracle re-derives the same positioned
    * substrings with 1-based slice arithmetic (ASCII corpus: DuckDB
    * character slicing and JVM char mapping agree).
    */
  val textUnigramLm = Q(
    (s, dir) => graft.text.UnigramLm.seedStats(
      t(s, dir, "documents"), "text", maxLen = 4, k = 50),
    Some("WITH w AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents) WHERE w <> '' GROUP BY w), s AS (SELECT w[i:i+l-1] AS piece, c FROM (SELECT w, c, unnest(generate_series(1, len(w))) AS i FROM w) t, (SELECT unnest(generate_series(1, 4)) AS l) ls WHERE i + l - 1 <= len(w)) SELECT piece, CAST(sum(c) AS BIGINT) AS cnt FROM s GROUP BY piece ORDER BY cnt DESC, piece LIMIT 50"))

  /** Typo-tolerant fuzzy self-join ([[graft.operators.FuzzyJoin]]):
    * all Levenshtein-distance-≤1 customer-name pairs via SymSpell
    * deletion-neighborhood blocking — candidate generation is an
    * equi-join on deletion-variant keys (never a cartesian, never an
    * all-pairs scan); the exact distance verifies only deduplicated
    * candidates with the codegen'd built-in. The oracle pays the
    * quadratic scan the operator exists to avoid — affordable at
    * sf0.01, which is exactly the point of the comparison.
    */
  val j13FuzzyJoin = Q(
    (s, dir) => graft.operators.FuzzyJoin.selfJoin(
      t(s, dir, "customer"), "c_custkey", "c_name", maxDist = 1),
    Some("SELECT a.c_custkey AS id1, b.c_custkey AS id2, CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist FROM customer a, customer b WHERE a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1"))

  /** d=2 tier of the fuzzy join ([[graft.operators.FuzzyJoin]]): the
    * double-deletion neighborhood with position-pair witness pruning —
    * sequential customer names are the worst case (every pair of digit
    * positions is a distance-2 neighbor), so the input narrows to a
    * 1-in-7 residue slice to keep the quadratic ORACLE affordable; the
    * operator itself never goes quadratic. Mod 7 leaves both distance-1
    * and distance-2 digit pairs dense in the slice.
    */
  val j13FuzzyJoinD2 = Q(
    (s, dir) => graft.operators.FuzzyJoin.selfJoin(
      t(s, dir, "customer").where(col("c_custkey") % 7 === 0),
      "c_custkey", "c_name", maxDist = 2),
    Some("WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 7 = 0) SELECT a.c_custkey AS id1, b.c_custkey AS id2, CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist FROM c a, c b WHERE a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 2"))

  /** Exact n-gram decontamination ([[graft.dedup.Dedup
    * .ngramContamination]], Brown et al. 2020 appendix C): train docs
    * (doc_id % 10 != 0) flagged by verbatim 8-gram overlap with the
    * held-out slice (doc_id % 10 == 0) — the exact complement of the
    * MinHash `dedup_contamination` scan. Held-out grams broadcast
    * (benchmarks are MB-sized against a 100 TB corpus → map-side
    * semi-join, zero corpus shuffle).
    */
  val dedupContaminationNgram = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.dedup.Dedup.ngramContamination(
          docs.where(col("doc_id") % 10 =!= 0),
          docs.where(col("doc_id") % 10 === 0),
          "doc_id", "text", n = 8, broadcastHeld = true)
        .select(col("id").as("doc_id"), col("n_overlap"), col("contaminated"))
    },
    Some("WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents), g AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ws) - 7), i -> array_to_string(ws[i:i+7], ' '))) AS gs FROM d WHERE len(ws) >= 8), hg AS (SELECT DISTINCT unnest(gs) AS g FROM g WHERE doc_id % 10 = 0), tg AS (SELECT doc_id, unnest(gs) AS g FROM g WHERE doc_id % 10 <> 0), ov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap FROM tg JOIN hg USING (g) GROUP BY doc_id) SELECT t.doc_id, COALESCE(ov.n_overlap, 0) AS n_overlap, COALESCE(ov.n_overlap, 0) > 0 AS contaminated FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) t LEFT JOIN ov USING (doc_id)"))

  /** Vocabulary coverage curve ([[TextAnalysis.vocabCoverage]]): token
    * coverage of the top-{100, 1000, 10000} word vocabularies — the
    * Zipf diagnostic behind tokenizer vocab sizing / OOV estimation.
    * One map-side-combined word count, a TakeOrdered head, never a
    * corpus-wide sort or window.
    */
  val textVocabCoverage = Q(
    (s, dir) => TextAnalysis.vocabCoverage(
      t(s, dir, "documents"), "text", Seq(100, 1000, 10000)),
    Some("WITH w AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents) WHERE w <> '' GROUP BY w), r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rn FROM w), t AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens FROM w) SELECT CAST(k AS INT) AS k, CAST(sum(CASE WHEN rn <= k THEN c ELSE 0 END) AS BIGINT) AS covered_tokens, any_value(total_tokens) AS total_tokens, floor(CAST(sum(CASE WHEN rn <= k THEN c ELSE 0 END) AS DOUBLE) / any_value(total_tokens) * 10000.0 + 0.5) / 10000.0 AS coverage FROM r CROSS JOIN t CROSS JOIN (VALUES (100), (1000), (10000)) ks(k) GROUP BY k"))

  /** Gopher-style repetition signals ([[TextAnalysis.repetitionSignals]]):
    * top-unigram fraction + intra-doc duplicate-trigram fraction — the
    * degenerate-generation filter of a training-data quality gate. The
    * trigram fraction never leaves its task (array arithmetic); the
    * unigram mode is one explode + map-side-combined (id, token) count.
    */
  val textRepetition = Q(
    (s, dir) => TextAnalysis.repetitionSignals(
      t(s, dir, "documents"), "doc_id", "text"),
    Some("WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents), tg AS (SELECT doc_id, CASE WHEN len(ws) >= 3 THEN list_transform(generate_series(1, len(ws) - 2), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) ELSE [] END AS g FROM d), base AS (SELECT doc_id, CAST(len(ws) AS INT) AS n_tokens FROM d), dt AS (SELECT doc_id, CASE WHEN len(g) >= 1 THEN floor((1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)) * 10000.0 + 0.5) / 10000.0 ELSE 0.0 END AS dup_trigram_frac FROM tg), u AS (SELECT doc_id, w, count(*) AS c FROM (SELECT doc_id, unnest(ws) AS w FROM d) GROUP BY 1, 2), tu AS (SELECT doc_id, floor(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS top_unigram_frac FROM u GROUP BY 1) SELECT base.doc_id, n_tokens, top_unigram_frac, dup_trigram_frac FROM base JOIN tu ON base.doc_id = tu.doc_id JOIN dt ON base.doc_id = dt.doc_id"))

  /** Duplicated-span fractions ([[graft.dedup.Dedup.spanDupFractions]]):
    * per document, the fraction of its sliding 5-token windows that
    * occur verbatim in at least one OTHER document — the
    * exact-substring-dedup signal (Lee et al. 2021). Spans shuffle as
    * fixed-width md5 keys; cost is linear in corpus tokens.
    */
  val dedupSpans = Q(
    (s, dir) => graft.dedup.Dedup.spanDupFractions(
        t(s, dir, "documents"), "doc_id", "text", w = 5)
      .select(col("id").as("doc_id"), col("n_spans"), col("dup_span_frac")),
    Some("WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents), s AS (SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS sh FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i FROM d WHERE len(ws) >= 5)), f AS (SELECT sh, count(DISTINCT doc_id) AS nd FROM s GROUP BY sh), per AS (SELECT doc_id, CAST(count(*) AS INT) AS n_spans, floor(CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS dup_span_frac FROM s JOIN f USING (sh) GROUP BY doc_id) SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans, coalesce(dup_span_frac, 0.0) AS dup_span_frac FROM d LEFT JOIN per USING (doc_id)"))

  /** Exact-substring-dedup rewrite ([[graft.dedup.Dedup
    * .removeDupSpans]]): the CLEANED corpus — every token covered by a
    * 5-token window duplicated across ≥2 docs is excised and the
    * survivors re-join — i.e. the output side of Lee et al. 2021, where
    * `dedup_spans` is only the measurement side. The oracle re-derives
    * the same covered-position arithmetic with list functions.
    */
  val dedupSpansClean = Q(
    (s, dir) => graft.dedup.Dedup.removeDupSpans(
        t(s, dir, "documents"), "doc_id", "text", w = 5)
      .select(col("id").as("doc_id"), col("n_tokens"), col("n_removed"),
        col("clean_text")),
    Some("WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents), sp AS (SELECT doc_id, i - 1 AS p, md5(array_to_string(ws[i:i+4], ' ')) AS sh FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i FROM d WHERE len(ws) >= 5)), dup AS (SELECT sh FROM sp GROUP BY sh HAVING count(DISTINCT doc_id) >= 2), cov AS (SELECT doc_id, list_distinct(flatten(list(generate_series(p, p + 4)))) AS covered FROM sp JOIN dup USING (sh) GROUP BY doc_id), j AS (SELECT d.doc_id, ws, COALESCE(covered, []) AS covered FROM d LEFT JOIN cov USING (doc_id)) SELECT doc_id, CAST(len(ws) AS INT) AS n_tokens, CAST(len(covered) AS INT) AS n_removed, COALESCE(array_to_string(list_transform(list_filter(generate_series(0, len(ws) - 1), i -> NOT list_contains(covered, i)), i -> ws[i + 1]), ' '), '') AS clean_text FROM j"))

  /** Winnowed span duplication ([[graft.dedup.Dedup.winnowedSpanDup]]):
    * the 100 TB form of `dedup_spans` — each doc shuffles only the
    * ~1/win winnowing-selected spans (min-hash of each length-win window
    * run, leftmost tie-break), preserving the guarantee that any shared
    * verbatim run of ≥ w + win − 1 tokens is caught. The oracle
    * re-derives the same selection with list arithmetic.
    */
  val dedupSpansWinnowed = Q(
    (s, dir) => graft.dedup.Dedup.winnowedSpanDup(
        t(s, dir, "documents"), "doc_id", "text", w = 5, win = 4)
      .select(col("id").as("doc_id"), col("n_spans"), col("dup_span_frac")),
    Some("WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents), h AS (SELECT doc_id, CASE WHEN len(ws) >= 5 THEN list_transform(generate_series(1, len(ws) - 4), i -> md5(array_to_string(ws[i:i+4], ' '))) ELSE [] END AS hs FROM d), sel AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(1, len(hs) - 3)), s -> s - 1 + list_position(hs[s:s+3], list_min(hs[s:s+3])))) AS idx, hs FROM h WHERE len(hs) >= 1), sp AS (SELECT doc_id, hs[CAST(i AS BIGINT)] AS sh FROM (SELECT doc_id, hs, unnest(idx) AS i FROM sel)), f AS (SELECT sh, count(DISTINCT doc_id) AS nd FROM sp GROUP BY sh), per AS (SELECT doc_id, CAST(count(*) AS INT) AS n_spans, floor(CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS dup_span_frac FROM sp JOIN f USING (sh) GROUP BY doc_id) SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans, coalesce(dup_span_frac, 0.0) AS dup_span_frac FROM d LEFT JOIN per USING (doc_id)"))

  /** SemDeDup semantic near-dup pruning ([[Ann.semanticDedup]]): assign
    * embeddings to pivot-centroid clusters, drop the higher id of every
    * intra-cluster pair with cosine ≥ 0.3 — per-cluster self-joins
    * bound the pair fanout (the SemDeDup scaling argument), and the
    * pivot centroids make the whole operator exactly oracle-checkable.
    */
  val dedupSemantic = Q(
    (s, dir) => Ann.semanticDedup(
      t(s, dir, "embeddings"), "vec_id", "embedding", "label",
      threshold = 0.3),
    Some("WITH cent AS (SELECT label AS cl, arg_min(list_transform(embedding, x -> CAST(x AS DOUBLE)), vec_id) AS cv FROM embeddings GROUP BY label), v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings), asg AS (SELECT vec_id, e, cl FROM (SELECT v.vec_id, v.e, c.cl, row_number() OVER (PARTITION BY v.vec_id ORDER BY round(list_cosine_similarity(v.e, c.cv), 4) DESC, c.cl) AS r FROM v CROSS JOIN cent c) WHERE r = 1), p AS (SELECT b.vec_id AS id2 FROM asg a JOIN asg b ON a.cl = b.cl AND a.vec_id < b.vec_id AND round(list_cosine_similarity(a.e, b.e), 4) >= 0.3), dr AS (SELECT DISTINCT id2 FROM p) SELECT asg.vec_id, asg.cl AS cluster, (dr.id2 IS NULL) AS keep FROM asg LEFT JOIN dr ON asg.vec_id = dr.id2"))

  /** STREAMING SemDeDup ([[graft.streaming.StreamingIngest
    * .semanticDedupDrain]]) — continuous semantic near-dup pruning of
    * an ingest stream: the corpus arrives as 4 id-RANGE parquet files
    * drained one per micro-batch (written sequentially, so the file
    * source's modification-time order matches ascending id order —
    * the drain's exact-parity precondition), and each batch is deduped
    * within itself and against everything drained before it, INCLUDING
    * already-dropped rows (the one-shot rule drops through a dropped
    * witness). Assignment uses the same full-corpus pivot centroids
    * the one-shot entry derives internally, so the union of drained
    * verdicts must equal the one-shot operator EXACTLY: the entry
    * shares `dedup_semantic`'s oracle VERBATIM — the
    * st_weighted_sample parity discipline.
    */
  val stDedupSemantic = Q(
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Ann.pivotCentroids(emb, "label", "vec_id", "embedding")
      val scratch = scratchPath("graft_st_sem")
      val path = scratch.toString
      val mx = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
      PhaseTimer.phase("input_stage") {
        var lo = 0L
        Seq(mx / 4, mx / 2, 3 * mx / 4, mx).foreach { hi =>
          emb.where(col("vec_id") >= lo && col("vec_id") < hi)
            .coalesce(1).write.mode("append").parquet(s"$path/in")
          // the file source orders batches by modification time at ms
          // granularity — force distinct mtimes so two fast sequential
          // writes cannot tie and drain out of id order (which would
          // break the shared-oracle parity, not correctness)
          Thread.sleep(10)
          lo = hi
        }
      }
      graft.streaming.StreamingIngest.semanticDedupDrain(
          s.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$path/in"),
          path, s"$path/ckpt", "vec_id", "embedding", "label",
          threshold = 0.3, cents)
        .awaitTermination()
      servedThenCleanup(
        graft.streaming.StreamingIngest.loadSemanticDedup(s, path),
        scratch)
    },
    dedupSemantic.oracle)

  /** STREAMING SemDeDup under REDELIVERY — the at-least-once-source
    * contract, oracle-pinned: the same 4 id-range quarters as
    * `st_dedup_semantic`, but every file is delivered TWICE (staged
    * copy written after all four originals, so each quarter re-arrives
    * batches later). A redelivered row's verdict stands at its FIRST
    * delivery: the drain drops already-seen ids before the step, so
    * the drained output holds exactly one verdict per distinct id and
    * equals the once-delivered drain — which under ordered first
    * deliveries equals the one-shot operator, so the entry shares
    * `dedup_semantic`'s oracle VERBATIM (a duplicate verdict row, a
    * re-seen state row, or a redelivery-perturbed verdict would all
    * hash-fail on row count or content).
    */
  val stDedupSemanticRedeliver = Q(
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Ann.pivotCentroids(emb, "label", "vec_id", "embedding")
      val scratch = scratchPath("graft_st_sem_rd")
      val path = scratch.toString
      val mx = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
      val quarters =
        Seq((0L, mx / 4), (mx / 4, mx / 2), (mx / 2, 3 * mx / 4),
          (3 * mx / 4, mx))
      // first deliveries in id order, then every quarter AGAIN
      PhaseTimer.phase("input_stage") {
        (quarters ++ quarters).foreach { case (lo, hi) =>
          emb.where(col("vec_id") >= lo && col("vec_id") < hi)
            .coalesce(1).write.mode("append").parquet(s"$path/in")
          Thread.sleep(10) // distinct mtimes: arrival order = write order
        }
      }
      graft.streaming.StreamingIngest.semanticDedupDrain(
          s.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$path/in"),
          path, s"$path/ckpt", "vec_id", "embedding", "label",
          threshold = 0.3, cents)
        .awaitTermination()
      servedThenCleanup(
        graft.streaming.StreamingIngest.loadSemanticDedup(s, path),
        scratch)
    },
    dedupSemantic.oracle)

  /** STREAMING SemDeDup under OUT-OF-ORDER arrival — the drain's
    * documented degraded mode, oracle-PINNED instead of spec'd-only:
    * the same 4 id-range quarters as `st_dedup_semantic`, delivered
    * in the order Q2, Q1, Q4, Q3 (sequential writes with distinct
    * mtimes — the file source drains them in exactly that order), so
    * lower-id rows arrive AFTER higher-id ones across two batch
    * pairs. The first-seen-wins rule: a row is dropped iff a similar
    * same-cluster LOWER-id witness arrived in the same batch or
    * earlier — a late-arriving lower id never retroactively drops a
    * row already drained (and a row whose only witness arrives later
    * than it is KEPT, where the one-shot operator would drop it). The
    * oracle models arrival order explicitly: the one-shot SemDeDup
    * CTEs plus an arrival-batch column derived from the same id-range
    * arithmetic, with the witness constraint `arrival(w) <=
    * arrival(r)` — so the degraded mode's exact verdicts are
    * hash-pinned, not just described. Replay idempotence over
    * reordered splits is property-swept in PropertySpec.
    */
  val stDedupSemanticOoo = Q(
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Ann.pivotCentroids(emb, "label", "vec_id", "embedding")
      val scratch = scratchPath("graft_st_sem_ooo")
      val path = scratch.toString
      val mx = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
      val quarters = Seq( // (lo, hi) in ARRIVAL order: Q2, Q1, Q4, Q3
        (mx / 4, mx / 2), (0L, mx / 4),
        (3 * mx / 4, mx), (mx / 2, 3 * mx / 4))
      PhaseTimer.phase("input_stage") {
        quarters.foreach { case (lo, hi) =>
          emb.where(col("vec_id") >= lo && col("vec_id") < hi)
            .coalesce(1).write.mode("append").parquet(s"$path/in")
          Thread.sleep(10) // distinct mtimes: arrival order = write order
        }
      }
      graft.streaming.StreamingIngest.semanticDedupDrain(
          s.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$path/in"),
          path, s"$path/ckpt", "vec_id", "embedding", "label",
          threshold = 0.3, cents)
        .awaitTermination()
      servedThenCleanup(
        graft.streaming.StreamingIngest.loadSemanticDedup(s, path),
        scratch)
    },
    Some("WITH cent AS (SELECT label AS cl, arg_min(list_transform(embedding, x -> CAST(x AS DOUBLE)), vec_id) AS cv FROM embeddings GROUP BY label), " +
      "v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings), " +
      "asg AS (SELECT vec_id, e, cl FROM (SELECT v.vec_id, v.e, c.cl, row_number() OVER (PARTITION BY v.vec_id ORDER BY round(list_cosine_similarity(v.e, c.cv), 4) DESC, c.cl) AS r FROM v CROSS JOIN cent c) WHERE r = 1), " +
      "mxt AS (SELECT max(vec_id) + 1 AS m FROM embeddings), " +
      // arrival batch per id: Q2 first, then Q1, Q4, Q3 — the entry's
      // write order, id-range arithmetic identical to the Spark side
      "arr AS (SELECT v.vec_id, CASE WHEN v.vec_id >= m // 4 AND v.vec_id < m // 2 THEN 0 WHEN v.vec_id < m // 4 THEN 1 WHEN v.vec_id >= (3 * m) // 4 THEN 2 ELSE 3 END AS bt FROM v CROSS JOIN mxt), " +
      "p AS (SELECT b.vec_id AS id2 FROM asg a JOIN asg b ON a.cl = b.cl AND a.vec_id < b.vec_id AND round(list_cosine_similarity(a.e, b.e), 4) >= 0.3 JOIN arr aa ON aa.vec_id = a.vec_id JOIN arr ab ON ab.vec_id = b.vec_id WHERE aa.bt <= ab.bt), " +
      "dr AS (SELECT DISTINCT id2 FROM p) " +
      "SELECT asg.vec_id, asg.cl AS cluster, (dr.id2 IS NULL) AS keep FROM asg LEFT JOIN dr ON asg.vec_id = dr.id2"))

  /** SemDeDup with the TWO-LEVEL assignment router ([[Ann
    * .assignClustersTwoLevel]]) — the configuration a web-scale
    * SemDeDup needs: with nlist tracking the corpus, the flat N·k
    * assignment stream turns quadratic. The stress A/B measures the
    * crossover INSIDE the fixture ladder: under forced
    * materialization (r15 — the earlier count()-based readings let
    * Catalyst prune the argmax, so the flat rung never computed its
    * dots and read ~1.6 s where the honest cost is ~2 orders higher
    * at f25) flat wins the small rungs and loses ~11× at f25, and on
    * the fixed-N k-scaling ladder the routed path wins at every
    * measured k. At web scale N·k ~ 10¹⁵ pairs is not runnable at any
    * constant. Routing through the `superCount` lowest-id centroids
    * caps the stream at N·(s + nprobe·k/s). Membership may differ
    * from the flat argmax
    * for nprobe < superCount — the router's documented approximation —
    * so this entry carries its OWN oracle replaying the full two-level
    * chain (super seeding, centroid routing, per-vector probe, argmax
    * over probed members ∪ the probed supers themselves) before the
    * unchanged intra-cluster pair/keep rule. Every input vector gets
    * exactly one (keep/drop) verdict — the router never drops rows.
    */
  val dedupSemanticRouted = Q(
    (s, dir) => Ann.semanticDedup(
      t(s, dir, "embeddings"), "vec_id", "embedding", "label",
      threshold = 0.3, router = Some((3, 2))),
    Some("WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings), " +
      "c AS (SELECT CAST(label AS BIGINT) AS cl, arg_min(e, vec_id) AS cv FROM (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings) GROUP BY label), " +
      "sp AS (SELECT cl AS spc, cv AS sv FROM c ORDER BY cl LIMIT 3), " +
      "cs AS (SELECT c.cl, sp.spc, row_number() OVER (PARTITION BY c.cl ORDER BY round(list_cosine_similarity(c.cv, sp.sv), 4) DESC, sp.spc) AS rn FROM c CROSS JOIN sp), " +
      "csr AS (SELECT cl, spc FROM cs WHERE rn = 1), " +
      "pq AS (SELECT v.vec_id, sp.spc, row_number() OVER (PARTITION BY v.vec_id ORDER BY round(list_cosine_similarity(v.e, sp.sv), 4) DESC, sp.spc) AS srank FROM v CROSS JOIN sp), " +
      "pr AS (SELECT vec_id, spc FROM pq WHERE srank <= 2), " +
      "cand AS (SELECT pr.vec_id, csr.cl FROM pr JOIN csr USING (spc) UNION SELECT vec_id, spc AS cl FROM pr), " +
      "a2 AS (SELECT cand.vec_id, cand.cl, row_number() OVER (PARTITION BY cand.vec_id ORDER BY round(list_cosine_similarity(v.e, c.cv), 4) DESC, cand.cl) AS rn FROM cand JOIN v USING (vec_id) JOIN c ON c.cl = cand.cl), " +
      "asg AS (SELECT t.vec_id, t.cl, v.e FROM (SELECT vec_id, cl FROM a2 WHERE rn = 1) t JOIN v USING (vec_id)), " +
      "p AS (SELECT b.vec_id AS id2 FROM asg a JOIN asg b ON a.cl = b.cl AND a.vec_id < b.vec_id AND round(list_cosine_similarity(a.e, b.e), 4) >= 0.3), " +
      "dr AS (SELECT DISTINCT id2 FROM p) " +
      "SELECT asg.vec_id, asg.cl AS cluster, (dr.id2 IS NULL) AS keep FROM asg LEFT JOIN dr ON asg.vec_id = dr.id2"))

  // --------------------------------------------------------------------
}
