package graft.multimodal

import graft.SparkSpec

class ImageMetadataSpec extends SparkSpec {
  import spark.implicits._

  private val png = Multimodal.encodeGrayPng(8, 6, (x, y) => x + y)
  private val jpg = Multimodal.encodeGrayJpeg(8, 6, (x, y) => x + y)

  test("PNG tEXt + iTXt chunks round-trip through the walker in order") {
    val tagged = ImageMetadata.pngAddText(png,
      Seq("Author" -> "ada", "Software" -> "graft"),
      Seq("Comment" -> "héllo"))  // iTXt is UTF-8: non-latin survives
    assert(ImageMetadata.pngTextChunks(tagged) ==
      Seq("Author" -> "ada", "Software" -> "graft", "Comment" -> "héllo"))
    // the tagged file still decodes as an image (chunks inserted after
    // IHDR keep the container valid)
    assert(Multimodal.decodeImage(tagged).width == 8)
  }

  test("JPEG EXIF ASCII + SHORT tags round-trip, names mapped, unknown " +
      "tags hex-labelled") {
    val tagged = ImageMetadata.jpegAddExif(jpg,
      Seq(0x010f -> "make_3", 0x0110 -> "model_5", 0x9999 -> "x"),
      Seq(0x0112 -> 6))
    assert(ImageMetadata.jpegExifTags(tagged) == Seq(
      "Make" -> "make_3", "Model" -> "model_5",
      "Orientation" -> "6", "tag_0x9999" -> "x"))
    assert(Multimodal.decodeImage(tagged).width == 8)
  }

  test("a long ASCII value spills to the data area and still parses") {
    val long = "a" * 40
    val tagged = ImageMetadata.jpegAddExif(jpg,
      Seq(0x0131 -> long), Seq())
    assert(ImageMetadata.jpegExifTags(tagged) == Seq("Software" -> long))
  }

  test("malformed metadata quarantines: parsed-so-far, never a throw") {
    // tEXt chunk whose declared length overruns the file: the walker
    // stops there but keeps what came before it
    val one = ImageMetadata.pngAddText(png, Seq("Author" -> "ada"))
    val insertAt = one.length - 12 // before IEND
    val bad = one.take(insertAt) ++
      Array[Byte](0, 0, 0x27, 0x0f) ++ "tEXtxx".getBytes ++
      one.drop(insertAt)
    assert(ImageMetadata.pngTextChunks(bad) == Seq("Author" -> "ada"))
    // APP1 with an overrun length: no tags, no throw
    val badJpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xe1.toByte, 0x7f, 0x00)
    assert(ImageMetadata.jpegExifTags(badJpg).isEmpty)
    // truncated TIFF body: IFD count promises entries the bytes lack
    val okJpg = ImageMetadata.jpegAddExif(jpg, Seq(0x010f -> "m"), Seq())
    assert(ImageMetadata.jpegExifTags(okJpg.take(18)).isEmpty)
    // non-image bytes
    assert(ImageMetadata.pngTextChunks("nope".getBytes).isEmpty)
    assert(ImageMetadata.jpegExifTags("nope".getBytes).isEmpty)
  }

  test("imageMetadata emits long-format rows per tag; metadata-less and " +
      "non-image blobs emit nothing") {
    val rows = Seq(
      (1L, ImageMetadata.pngAddText(png, Seq("Author" -> "ada"))),
      (2L, ImageMetadata.jpegAddExif(jpg, Seq(0x010f -> "m"),
        Seq(0x0112 -> 3))),
      (3L, png),                 // valid image, no metadata
      (4L, "garbage".getBytes))  // not an image
      .toDF("doc_id", "content")
    val out = ImageMetadata.imageMetadata(rows, "doc_id", "content")
      .as[(Long, String, String, String)].collect().sortBy(r => (r._1, r._3))
    assert(out.toSeq == Seq(
      (1L, "png", "Author", "ada"),
      (2L, "jpeg", "Make", "m"),
      (2L, "jpeg", "Orientation", "3")))
  }
}
