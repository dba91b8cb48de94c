package graft

import graft.multimodal.Multimodal.{ExifParser, ImageCodec}

/** L64: the byte-level JPEG/TIFF EXIF parser — round trip through the
  * writer, a hand-authored big-endian golden blob (independent of the
  * writer, so a symmetric writer/parser bug can't hide), real-JPEG
  * interop, and corrupt-input fallbacks.
  */
class ExifSpec extends SparkSpecBase {

  test("round trip: builder → parser recovers every field (little-endian)") {
    val tiff = ExifParser.buildTiffExif(6, "graftcam", "2026:08:14 01:02:03", 1920, 1080)
    val got = ExifParser.parseTiff(tiff, 0, tiff.length).get
    assert(got.orientation === 6)
    assert(got.make === "graftcam")
    assert(got.dateTime === "2026:08:14 01:02:03")
    assert(got.pxWidth === 1920)
    assert(got.pxHeight === 1080)
  }

  test("golden big-endian TIFF parses (hand-authored bytes, not the writer)") {
    // MM, magic 42, IFD0 @8: ONE entry {tag 0x0112 orientation,
    // type 3 SHORT, count 1, value 8 in the upper half}, next IFD 0
    val b = Array[Int](
      'M', 'M', 0x00, 0x2a, 0x00, 0x00, 0x00, 0x08, // header
      0x00, 0x01,                                    // 1 entry
      0x01, 0x12, 0x00, 0x03, 0x00, 0x00, 0x00, 0x01, 0x00, 0x08, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00                         // next IFD
    ).map(_.toByte)
    val got = ExifParser.parseTiff(b, 0, b.length).get
    assert(got.orientation === 8)
    assert(got.make === "" && got.pxWidth === 0)
  }

  test("spliced JPEG still decodes AND yields its EXIF") {
    val img = ImageCodec.syntheticPattern(7L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    assert(ExifParser.parseJpegExif(jpeg).isEmpty, "plain JPEG has no EXIF")
    val withExif = ExifParser.spliceExifApp1(jpeg,
      ExifParser.buildTiffExif(3, "cam", "2026:01:01 00:00:00", 64, 64))
    val dec = ImageCodec.decode(withExif)
    assert(dec.isDefined && dec.get.getWidth === 64, "APP1 splice must not break decode")
    val meta = ExifParser.parseJpegExif(withExif).get
    assert(meta.orientation === 3 && meta.make === "cam" && meta.pxWidth === 64)
  }

  test("corrupt inputs fall back to None, never throw") {
    assert(ExifParser.parseJpegExif(Array[Byte](1, 2, 3)).isEmpty)
    val png = ImageCodec.encodePng(ImageCodec.syntheticPattern(1L))
    assert(ExifParser.parseJpegExif(png).isEmpty, "PNG is not a JPEG")
    val tiff = ExifParser.buildTiffExif(1, "x", "y", 1, 1)
    assert(ExifParser.parseTiff(tiff.take(6), 0, 6).isEmpty, "truncated TIFF")
    // APP1 claiming a longer length than the payload
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      0x7f, 0x00)
    assert(ExifParser.parseJpegExif(jpeg).isEmpty)
  }

  test("mm6 catalog entry extracts the ten planted EXIF records") {
    val got = graft.operators.MediaOps.catalog
      .find(_.name == "mm6_exif_metadata").get.run(spark, sf0001)
      .collect()
    assert(got.length === 10)
    for ((r, i) <- got.zipWithIndex) {
      assert(r.getString(0) === "graftcam")
      assert(r.getLong(1) === (i % 8 + 1).toLong, s"orientation $i")
      assert(r.getLong(2) === 640L + i)
      assert(r.getLong(3) === 480L + i)
      assert(r.getString(4) === f"2026:08:${i + 1}%02d 00:00:00")
    }
  }
}
