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

  // ------------------------------------------------------------------
  // Real codecs (javax.imageio PNG, javax.sound.sampled WAV)
  // ------------------------------------------------------------------

  private def pixel(x: Int, y: Int): Int = (x * 7 + y * 13) % 256

  private def pngDf = Seq(
    (1L, Multimodal.encodeGrayPng(5, 3, pixel)),
    (2L, Multimodal.encodeGrayPng(8, 8, (x, y) => x * y % 256)),
    (3L, "not a png at all".getBytes(StandardCharsets.UTF_8)))
    .toDF("doc_id", "content")

  test("encodeGrayPng → decodeGray round-trips every pixel exactly") {
    val Some((w, h, px)) =
      Multimodal.decodeGray(Multimodal.encodeGrayPng(5, 3, pixel))
    assert((w, h) == (5, 3))
    for (y <- 0 until 3; x <- 0 until 5)
      assert(px(y * 5 + x) == pixel(x, y))
    assert(Multimodal.decodeGray("junk".getBytes).isEmpty)
  }

  test("decodeGray rescales 16-bit grayscale PNG to the 8-bit contract " +
      "and featurizeImage never overflows its histogram") {
    // well-formed 16-bit gray PNG with samples up to 65535
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 4; x <- 0 until 4)
      img.getRaster.setSample(x, y, 0, (x + y * 4) * 4369) // 0..65535
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bytes = bos.toByteArray
    val Some((w, h, px)) = Multimodal.decodeGray(bytes)
    assert((w, h) == (4, 4))
    assert(px.forall(v => v >= 0 && v <= 255), s"out-of-range: ${px.toSeq}")
    assert(px.max == 255 && px.min == 0) // full range survives the rescale
    // the featurizer path (the original crash site) produces a row
    val df = Seq((1L, bytes)).toDF("doc_id", "content")
    val feats = Multimodal.featurizeImage(df, "doc_id", "content", bins = 16)
      .select("features").as[Seq[Double]].head()
    assert(feats.length == 16 && math.abs(feats.sum - 1.0) < 1e-12)
  }

  test("decodeImage sniffs and decodes real PNG; garbage degrades safely") {
    val m = Multimodal.decodeImage(Multimodal.encodeGrayPng(5, 3, pixel))
    assert(m.format == "png" && m.width == 5 && m.height == 3 && m.nFrames == 1)
    val bad = Multimodal.decodeImage("garbage".getBytes)
    assert(bad.format == "unknown" && bad.width == 0)
    // PNG magic but truncated body: reader fails → unknown, no throw
    val truncated = Multimodal.encodeGrayPng(5, 3, pixel).take(12)
    assert(Multimodal.decodeImage(truncated).format == "unknown")
  }

  test("decodeImageMeta decodes real blobs and quarantines garbage") {
    val out = Multimodal.decodeImageMeta(pngDf, "doc_id", "content")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("format") == "png")
    assert(out(0).getAs[Int]("width") == 5 && out(0).getAs[Int]("height") == 3)
    assert(out(1).getAs[Int]("width") == 8)
    assert(out(2).getAs[String]("format") == "unknown")
  }

  test("resizeImage nearest-neighbor samples the decoded raster") {
    val out = Multimodal.resizeImage(pngDf, "doc_id", "content", 2, 2)
      .where($"doc_id" === 1L)
      .select("resized").as[Seq[Int]].head()
    // NN grid over 5×3: src x ∈ {0·5/2, 1·5/2} = {0, 2}, y ∈ {0, 1}
    assert(out == Seq(pixel(0, 0), pixel(2, 0), pixel(0, 1), pixel(2, 1)))
    // garbage rows produce no output instead of crashing
    val ids = Multimodal.resizeImage(pngDf, "doc_id", "content", 2, 2)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L))
  }

  test("featurizeImage histograms the decoded gray levels, L1-normalized") {
    val feats = Multimodal.featurizeImage(pngDf, "doc_id", "content", bins = 16)
      .where($"doc_id" === 1L)
      .select("features").as[Seq[Double]].head()
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0) < 1e-12)
    // recompute bin of pixel(0,0)..: every pixel lands in bin v/16
    val expect = new Array[Double](16)
    for (y <- 0 until 3; x <- 0 until 5) expect(pixel(x, y) / 16) += 1.0 / 15
    feats.zip(expect).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("decodeImage handles real BMP bytes (second JVM-bundled format)") {
    val img = new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 3; x <- 0 until 4)
      img.getRaster.setSample(x, y, 0, (x * 10 + y) & 0xff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val bytes = bos.toByteArray
    assert(Multimodal.sniffFormat(bytes) == "bmp")
    val m = Multimodal.decodeImage(bytes)
    assert(m.format == "bmp" && m.width == 4 && m.height == 3)
    val Some((w, h, px)) = Multimodal.decodeGray(bytes)
    assert((w, h) == (4, 3) && px(1 * 4 + 2) == 21) // (x=2,y=1) → 2·10+1
  }

  test("encodeGrayJpeg → decodeImage round-trips the container facts " +
      "(JPEG is lossy; dimensions and format are the contract)") {
    val bytes = Multimodal.encodeGrayJpeg(20, 14, (x, y) => (x * 7 + y) & 0xff)
    assert(bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8)
    assert(Multimodal.sniffFormat(bytes) == "jpeg")
    val m = Multimodal.decodeImage(bytes)
    assert(m.format == "jpeg" && m.width == 20 && m.height == 14 &&
      m.nFrames == 1)
    // truncated JPEG quarantines, never throws
    val cut = bytes.take(bytes.length / 2)
    assert(Multimodal.decodeImage(cut).format match {
      case "jpeg" | "unknown" => true // decoder may salvage dims or reject
      case _ => false
    })
    assert(Multimodal.decodeImage("not an image".getBytes).format ==
      "unknown")
  }

  test("decodePcm8 round-trips samples; audioFeatures computes exact " +
      "RMS and zero crossings per complete frame") {
    val samples = Array.tabulate(25)(k => ((k * 37 + 5) % 256).toByte)
    val wav = Multimodal.encodeWavPcm8(samples, 8000)
    assert(Multimodal.decodePcm8(wav).get.toSeq ==
      samples.map(_ & 0xff).toSeq)
    assert(Multimodal.decodePcm8("nope".getBytes).isEmpty)

    val df = Seq((1L, wav), (2L, "junk".getBytes)).toDF("doc_id", "content")
    val out = Multimodal.audioFeatures(df, "doc_id", "content", frameSize = 10)
      .collect()
    // 25 samples at frame 10 → 2 complete frames, tail dropped; junk → none
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    assert(out.map(_.getInt(1)).sorted.toSeq == Seq(0, 1))
    // recompute frame 0 by hand
    val xs = samples.take(10).map(b => ((b & 0xff) - 128) / 128.0)
    val rms = math.sqrt(xs.map(x => x * x).sum / 10)
    val zc = (1 until 10).count(k =>
      ((samples(k) & 0xff) >= 128) != ((samples(k - 1) & 0xff) >= 128))
    val f0 = out.find(_.getInt(1) == 0).get
    assert(f0.getDouble(2) == rms && f0.getInt(3) == zc)
  }

  test("encodeWavPcm8 → decodeAudio round-trips format and frame count") {
    val samples = Array.tabulate(200)(k => (k % 256).toByte)
    val wav = Multimodal.encodeWavPcm8(samples, sampleRate = 8000)
    assert(Multimodal.sniffFormat(wav) == "wav")
    val m = Multimodal.decodeAudio(wav)
    assert(m == Multimodal.AudioMeta("wav", 8000, 1, 200L))
    assert(Multimodal.decodeAudio("nope".getBytes).format == "unknown")
  }

  test("decodeAudioMeta decodes real WAV blobs per row") {
    val df = Seq(
      (1L, Multimodal.encodeWavPcm8(Array.fill(100)(0.toByte), 8000)),
      (2L, Multimodal.encodeWavPcm8(Array.fill(50)(1.toByte), 16000)),
      (3L, "junk".getBytes)).toDF("doc_id", "content")
    val out = Multimodal.decodeAudioMeta(df, "doc_id", "content")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_frames") == 100L)
    assert(out(1).getAs[Int]("sample_rate") == 16000)
    assert(out(2).getAs[String]("format") == "unknown")
  }

  // ------------------------------------------------------------------
  // Real video container (Y4M)
  // ------------------------------------------------------------------

  test("encodeY4mMono → demuxY4m round-trips header fields, frame " +
      "offsets, and every plane byte exactly") {
    def px(f: Int, k: Int): Int = (f * 7 + k * 13) % 256
    val y4m = Multimodal.encodeY4mMono(6, 4, 3, px)
    val Some((meta, frames)) = Multimodal.demuxY4m(y4m)
    assert(meta == Multimodal.VideoMeta("y4m", 6, 4, "mono", 3))
    assert(frames.length == 3 && frames.forall(_._2 == 24))
    for (f <- 0 until 3; k <- 0 until 24) {
      val (off, _) = frames(f)
      assert((y4m(off + k) & 0xff) == px(f, k), s"frame $f byte $k")
    }
    // zero frames is a valid (empty) stream
    val empty = Multimodal.encodeY4mMono(6, 4, 0, px)
    assert(Multimodal.demuxY4m(empty).get._2.isEmpty)
  }

  test("demuxY4m computes 420/422/444 frame sizes from the header and " +
      "rejects every malformation instead of misaligning") {
    assert(Multimodal.y4mFrameSize(8, 4, "mono") == Some(32L))
    assert(Multimodal.y4mFrameSize(8, 4, "420jpeg") == Some(48L))
    assert(Multimodal.y4mFrameSize(8, 4, "422") == Some(64L))
    assert(Multimodal.y4mFrameSize(8, 4, "444") == Some(96L))
    assert(Multimodal.y4mFrameSize(8, 4, "bogus").isEmpty)
    // a real 420 stream with explicit C tag and FRAME params demuxes
    val hdr = "YUV4MPEG2 W4 H2 F25:1 C420jpeg\n".getBytes("US-ASCII")
    val f0 = "FRAME Xcustom\n".getBytes("US-ASCII") ++ Array.fill(12)(7.toByte)
    val ok = Multimodal.demuxY4m(hdr ++ f0)
    assert(ok.get._1 == Multimodal.VideoMeta("y4m", 4, 2, "420jpeg", 1))
    // malformations: wrong magic, truncated frame, missing marker
    assert(Multimodal.demuxY4m("MPEG4 W4 H2\nFRAME\n".getBytes).isEmpty)
    assert(Multimodal.demuxY4m((hdr ++ f0).dropRight(1)).isEmpty)
    assert(Multimodal.demuxY4m(
      hdr ++ "NOTFRAME\n".getBytes ++ Array.fill(12)(0.toByte)).isEmpty)
    assert(Multimodal.demuxY4m("YUV4MPEG2 W4 Hx\n".getBytes).isEmpty)
    assert(Multimodal.demuxY4m(Array[Byte]()).isEmpty)
  }

  test("frameSampleVideo emits every Nth real frame; decodeVideoMeta " +
      "quarantines malformed blobs") {
    val vids = Seq(
      (1L, Multimodal.encodeY4mMono(4, 2, 4, (f, k) => f * 10 + k)),
      (2L, Multimodal.encodeY4mMono(4, 2, 1, (_, k) => k)),
      (3L, "definitely not a video".getBytes))
      .toDF("doc_id", "content")
    val meta = Multimodal.decodeVideoMeta(vids, "doc_id", "content")
      .orderBy("doc_id").collect()
    assert(meta(0).getAs[Int]("n_frames") == 4)
    assert(meta(1).getAs[String]("colorspace") == "mono")
    assert(meta(2).getAs[String]("format") == "unknown")
    val frames = Multimodal.frameSampleVideo(vids, "doc_id", "content", 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]]("frame")))
    // doc 1: frames 0 and 2 of 4; doc 2: frame 0; doc 3: nothing
    assert(frames.map(f => (f._1, f._2)).sorted.toSeq ==
      Seq((1L, 0), (1L, 2), (2L, 0)))
    val f2 = frames.find(f => f._1 == 1L && f._2 == 2).get._3
    assert(f2.toSeq == Array.tabulate(8)(k => (20 + k).toByte).toSeq)
  }

  test("encodeAvi → demuxAvi round-trips meta and exact frame payloads, " +
      "including odd-length chunk padding") {
    // odd-length frames force the RIFF even-byte pad path
    val payloads = Seq(
      Array.tabulate(33)(k => (k * 3).toByte),
      Array.tabulate(32)(k => (k * 5).toByte),
      Array.tabulate(7)(k => (k * 7).toByte))
    val avi = Multimodal.encodeAvi(8, 4, "DIB ", payloads)
    val Some((meta, frames)) = Multimodal.demuxAvi(avi): @unchecked
    assert(meta == Multimodal.VideoMeta("avi", 8, 4, "dib", 3))
    assert(frames.length == 3)
    payloads.zip(frames).foreach { case (p, (off, len)) =>
      assert(len == p.length)
      assert(java.util.Arrays.copyOfRange(avi, off, off + len).toSeq == p.toSeq)
    }
  }

  test("MJPEG-in-AVI: real JPEG frames demux and decode via javax.imageio") {
    val jpegs = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(
        16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 12).foreach(y => (0 until 16).foreach { x =>
        val g = (x * 16 + y * 7 + f * 40) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      })
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    val avi = Multimodal.encodeAvi(16, 12, "MJPG", jpegs)
    val Some((meta, frames)) = Multimodal.demuxAvi(avi): @unchecked
    assert(meta.colorspace == "mjpg" && meta.nFrames == 3)
    // every demuxed frame is a decodable JPEG with the container's dims
    frames.foreach { case (off, len) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(
          java.util.Arrays.copyOfRange(avi, off, off + len)))
      assert(img != null && img.getWidth == 16 && img.getHeight == 12)
    }
  }

  test("demuxAvi rejects malformations instead of misaligning") {
    val good = Multimodal.encodeAvi(8, 4, "DIB ",
      Seq(Array.tabulate(32)(_.toByte)))
    // truncated container: declared RIFF size exceeds the bytes
    assert(Multimodal.demuxAvi(good.dropRight(10)).isEmpty)
    // wrong magic
    assert(Multimodal.demuxAvi("JUNKJUNKJUNK".getBytes).isEmpty)
    // avih frame count contradicting the movi walk
    val lying = good.clone()
    // avih dwTotalFrames lives at hdrl→avih data offset 16; find it by
    // scanning for the avih fourcc and patching its data
    val avihAt = good.indices.find(i => i + 4 <= good.length &&
      new String(good, i, 4, "US-ASCII") == "avih").get
    lying(avihAt + 8 + 16) = 9 // declare 9 frames, movi has 1
    assert(Multimodal.demuxAvi(lying).isEmpty)
    // the untouched container still demuxes
    assert(Multimodal.demuxAvi(good).nonEmpty)
  }

  test("dhashImage packs horizontal gradient signs MSB-first with the " +
      "resizeImage floor sampling; garbage yields no row") {
    // 9×8 input: the resample is the identity (sx = x·9/9, sy = y·8/8),
    // so every bit is directly px(x,y) > px(x+1,y) on the raw raster
    val img = Multimodal.encodeGrayPng(9, 8, pixel)
    val rows = Multimodal.dhashImage(
      Seq((1L, img), (2L, "junk".getBytes)).toDF("doc_id", "content"),
      "doc_id", "content").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L)
    val fp = rows(0).getLong(1)
    for (y <- 0 until 8; x <- 0 until 8) {
      val want = pixel(x, y) > pixel(x + 1, y)
      val got = ((fp >>> (63 - (y * 8 + x))) & 1L) == 1L
      assert(got == want, s"bit ($x,$y)")
    }
  }

  test("dhash is brightness-invariant and flips bits under structural " +
      "edits — the perceptual property the hash exists for") {
    def hash(f: (Int, Int) => Int): Long =
      Multimodal.dhashImage(
        Seq((1L, Multimodal.encodeGrayPng(20, 15, f)))
          .toDF("doc_id", "content"), "doc_id", "content")
        .collect()(0).getLong(1)
    val base = hash((x, y) => (x * 11 + y * 17) % 200)
    // +40 gray everywhere (no wrap: max 199+40): every COMPARISON is
    // unchanged, so the hash is identical — a re-exposed photo dedups
    assert(hash((x, y) => (x * 11 + y * 17) % 200 + 40) == base)
    // structurally different image → many bits differ
    val other = hash((x, y) => (x * 5 + y * 3 + x * y) % 256)
    assert(java.lang.Long.bitCount(base ^ other) > 8)
  }

  test("audioFingerprint: frame partition + energy gradient signs, " +
      "level-shift invariance, short/garbage quarantine") {
    def wav(samples: Array[Int]): Array[Byte] =
      Multimodal.encodeWavPcm8(samples.map(_.toByte), sampleRate = 8000)
    def fps(rows: (Long, Array[Byte])*): Map[Long, Long] =
      Multimodal.audioFingerprint(rows.toDF("doc_id", "content"),
        "doc_id", "content")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = Array.tabulate(130)(k => (k * k * 5 + k * 3) % 200)
    val out = fps(
      1L -> wav(base),
      2L -> wav(base.map(_ + 55)), // level shift, no wrap (max 199+55)
      3L -> wav(Array.tabulate(130)(k => (k * 7) % 200)), // different wave
      4L -> wav(Array.tabulate(40)(_ % 200)), // < 65 samples: no row
      5L -> ("not audio".getBytes: Array[Byte]))
    assert(out.keySet == Set(1L, 2L, 3L))
    // reference fingerprint computed independently of the operator
    val e = new Array[Long](65)
    for (i <- base.indices) e(i * 65 / base.length) += base(i)
    var want = 0L
    for (k <- 0 until 64) want = (want << 1) | (if (e(k) > e(k + 1)) 1L else 0L)
    assert(out(1L) == want)
    assert(out(2L) == out(1L), "uniform level shift preserves every bit")
    assert(out(3L) != out(1L))
  }

  test("image near-dup via nearPairsFromFingerprints matches brute force " +
      "over the same dHashes") {
    import graft.dedup.SimHash
    // 3 base patterns × 4 variants each, variant v perturbing one pixel
    // column by v (v=0 is the unperturbed base)
    val blobs = (0 until 12).map { i =>
      val g = i % 3; val v = i / 3
      (i.toLong, Multimodal.encodeGrayPng(18, 14, (x, y) =>
        ((x + g * 3) * (y + g * 5 + 2) * 7 + (if (x == v * 2) 60 * v else 0)) % 256))
    }
    val fp = Multimodal.dhashImage(blobs.toDF("doc_id", "content"),
      "doc_id", "content")
    val hashes = fp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- 0L until 12L; b <- (a + 1) until 12L
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if d <= 7
    } yield (a, b, d)).toSet
    assert(brute.nonEmpty, "fixture must plant at least one near pair")
    val banded = SimHash.nearPairsFromFingerprints(fp, maxDist = 7, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute)
  }

  test("sceneCuts flags the planted shot boundary and skips " +
      "single-frame videos") {
    import spark.implicits._
    // 3 frames, 8 px each: f0≈f1 (delta 2 everywhere), f2 jumps by 100
    val frames = Seq(
      Array.tabulate(8)(k => (10 + k).toByte),
      Array.tabulate(8)(k => (12 + k).toByte),
      Array.tabulate(8)(k => (112 + k).toByte))
    val vids = Seq(
      (1L, Multimodal.encodeAvi(4, 2, "DIB ", frames)),
      (2L, Multimodal.encodeAvi(4, 2, "DIB ", frames.take(1))))
      .toDF("doc_id", "content")
    val out = Multimodal.sceneCuts(vids, "doc_id", "content",
        threshold = 50.0)
      .as[(Long, Int, Double, Boolean)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((1L, 0, 2.0, false), (1L, 1, 100.0, true)))
    // shot sampling on the same fixture: frames 0-1 form shot 0
    // (keyframe 0), the cut opens shot 1 at frame 2; the single-frame
    // video is one whole shot
    val shots = Multimodal.shotSample(vids, "doc_id", "content", 50.0)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(shots == Set(
      (1L, 0L, 0, 2L), (1L, 1L, 2, 1L), (2L, 0L, 0, 1L)))
  }

  test("letterboxDetect counts uniform border lines, including " +
      "asymmetric bars and the no-border image") {
    import spark.implicits._
    // 6x5 with 0-bars top/bottom/right but a varying FIRST column
    val px = Array(
      0, 0, 0, 0, 0, 0,
      1, 2, 3, 4, 5, 0,
      2, 3, 4, 5, 6, 0,
      3, 4, 5, 6, 7, 0,
      0, 0, 0, 0, 0, 0)
    val imgs = Seq(
      (1L, Multimodal.encodeGrayPng(6, 5, (x, y) => px(y * 6 + x))),
      (2L, Multimodal.encodeGrayPng(4, 3, (x, y) => x * 10 + y)))
      .toDF("doc_id", "content")
    val out = Multimodal.letterboxDetect(imgs, "doc_id", "content")
      .as[(Long, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 6, 5, 1, 1, 0, 1)))
    assert(out(2L) == ((2L, 4, 3, 0, 0, 0, 0)))
  }

  test("silenceTrim reports lead/trail runs, eps tolerance, and the " +
      "all-silent drop signal") {
    import spark.implicits._
    def wav(s: Seq[Int]) =
      Multimodal.encodeWavPcm8(s.map(_.toByte).toArray, 8000)
    val clips = Seq(
      // 2 lead + 3 trail around an active band; 129 is INSIDE eps=2
      (1L, wav(Seq(128, 129, 200, 210, 190, 128, 127, 126))),
      (2L, wav(Seq.fill(6)(128))),           // all silence
      (3L, wav(Seq(200, 201, 202))))         // no silence at all
      .toDF("doc_id", "content")
    val out = Multimodal.silenceTrim(clips, "doc_id", "content", eps = 2)
      .as[(Long, Int, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 8, 2, 3, 3)))
    assert(out(2L) == ((2L, 6, 6, 6, 0)))
    assert(out(3L) == ((3L, 3, 0, 0, 3)))
  }

  test("imageStats: hand-computed stats; a constant raster reads " +
      "std 0 / entropy 0; malformed blobs quarantine") {
    import spark.implicits._
    val imgs = Seq(
      // 2x2: values 0, 255, 16, 16 -> buckets 0,15,1,1 (mode 1)
      (1L, Multimodal.encodeGrayPng(2, 2, (x, y) =>
        Seq(Seq(0, 255), Seq(16, 16))(y)(x))),
      (2L, Multimodal.encodeGrayPng(3, 1, (_, _) => 77)), // constant
      (3L, Array[Byte](1, 2, 3)))                          // garbage
      .toDF("doc_id", "content")
    val out = Multimodal.imageStats(imgs, "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L)) // quarantined, not crashed
    val r1 = out(1L)
    assert((r1.getInt(1), r1.getInt(2)) == ((2, 2)))
    assert(r1.getDouble(3) == 71.75) // (0+255+16+16)/4
    val varr = (0.0 + 255.0 * 255 + 256 + 256) / 4 - 71.75 * 71.75
    assert(math.abs(r1.getDouble(4) - math.sqrt(varr)) < 1e-3)
    // entropy: p = {1/4, 1/4, 2/4} -> 1.5 bits
    assert(r1.getDouble(5) == 1.5)
    assert((r1.getInt(6), r1.getInt(7), r1.getInt(8)) == ((0, 255, 1)))
    val r2 = out(2L)
    assert(r2.getDouble(4) == 0.0 && r2.getDouble(5) == 0.0)
    assert((r2.getInt(6), r2.getInt(7)) == ((77, 77)))
  }

  test("zeroCrossings: alternating signal reads zcr 1, constant reads " +
      "0, zero samples break runs, and n<2 reports null") {
    import spark.implicits._
    def wav(s: Seq[Int]) =
      Multimodal.encodeWavPcm8(s.map(_.toByte).toArray, 8000)
    val clips = Seq(
      (1L, wav(Seq(200, 50, 200, 50, 200))),  // every pair crosses
      (2L, wav(Seq(200, 200, 200))),          // never crosses
      (3L, wav(Seq(200, 128, 50))),           // zero breaks the run
      (4L, wav(Seq(77))))                     // single sample: null zcr
      .toDF("doc_id", "content")
    val out = Multimodal.zeroCrossings(clips, "doc_id", "content")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L) == ((5, 4L, Some(1.0))))
    assert(out(2L) == ((3, 0L, Some(0.0))))
    assert(out(3L) == ((3, 0L, Some(0.0))))
    assert(out(4L) == ((1, 0L, None)))
  }

  test("loudnessWindows: hand-computed rms/db/peak per window, a short " +
      "tail window, and NULL db on digital silence") {
    import spark.implicits._
    def wav(s: Seq[Int]) =
      Multimodal.encodeWavPcm8(s.map(_.toByte).toArray, 8000)
    val clips = Seq(
      // window=4: [full-scale, mixed] then a short tail of 2
      (1L, wav(Seq(255, 1, 255, 1, 128, 192, 128, 64, 228, 28))),
      (2L, wav(Seq.fill(4)(128))))           // digital silence
      .toDF("doc_id", "content")
    val out = Multimodal.loudnessWindows(clips, "doc_id", "content",
        window = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getInt(5))).toMap
    assert(out.keySet == Set((1L, 0), (1L, 1), (1L, 2), (2L, 0)))
    // window 0: dev 127,127,127,127 -> rms 1.0, db 0.0, peak 127
    assert(out((1L, 0)) == ((4, 1.0, Some(0.0), 127)))
    // window 1: dev 0,64,0,64 -> rms sqrt(8192/4)/127
    val rms1 = math.sqrt(8192.0 / (4 * 127.0 * 127.0))
    assert(math.abs(out((1L, 1))._2 - rms1) < 1e-6)
    assert(out((1L, 1))._4 == 64)
    // short tail: dev 100,100 -> rms 100/127, n=2
    assert(out((1L, 2))._1 == 2 && out((1L, 2))._4 == 100)
    assert(math.abs(out((1L, 2))._2 - 100.0 / 127.0) < 1e-6)
    // digital silence: rms 0, db NULL
    assert(out((2L, 0)) == ((4, 0.0, None, 0)))
  }
}
