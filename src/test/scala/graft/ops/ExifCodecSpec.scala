package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** EXIF build/splice/parse: both byte orders round-trip exactly, the
  * splice leaves the JPEG decodable, and the parser carries the codec
  * plane's totality contract (malformed framing/offsets/headers return
  * None, never garbage).
  */
class ExifCodecSpec extends AnyFunSuite {

  private def jpeg(w: Int = 16, h: Int = 9, v: Int = 130): Array[Byte] =
    JpegCodec.encode(ImageCodec.Raster(w, h, Array.fill(w * h * 3)(v.toByte)), quality = 74)

  test("round trip: both byte orders recover every written field") {
    for (le <- Seq(true, false)) {
      val app1 = ExifCodec.buildApp1(le, orientation = 6, xresNum = 300L, xresDen = 1L,
        dateTime = "2024:02:29 23:59:58", iso = 1600, pixelX = 4032L)
      val tagged = ExifCodec.spliceApp1(jpeg(), app1).get
      val ex = ExifCodec.parseExif(tagged).getOrElse(fail(s"parse failed (le=$le)"))
      assert(ex.byteOrder == (if (le) "II" else "MM"))
      assert(ex.orientation == 6)
      assert((ex.xresNum, ex.xresDen) == ((300L, 1L)))
      assert(ex.dateTime == "2024:02:29 23:59:58")
      assert(ex.iso == 1600)
      assert(ex.pixelX == 4032L)
    }
  }

  test("splice preserves the image: tagged file decodes to the same raster") {
    val base = jpeg(17, 11, 99) // odd dims: partial MCUs in play
    val app1 = ExifCodec.buildApp1(le = true, 1, 72L, 1L, "2020:01:01 00:00:00", 100, 17L)
    val tagged = ExifCodec.spliceApp1(base, app1).get
    val d0 = JpegCodec.decode(base).get
    val d1 = JpegCodec.decode(tagged).get
    assert(d1.width == d0.width && d1.height == d0.height)
    assert(java.util.Arrays.equals(d1.rgb, d0.rgb))
  }

  test("totality: malformed inputs return None, never garbage") {
    val app1 = ExifCodec.buildApp1(le = true, 1, 72L, 1L, "2020:01:01 00:00:00", 100, 16L)
    val tagged = ExifCodec.spliceApp1(jpeg(), app1).get
    assert(ExifCodec.spliceApp1(Array[Byte](1, 2, 3), app1).isEmpty) // not a JPEG
    assert(ExifCodec.parseExif(jpeg()).isEmpty) // no APP1 present
    assert(ExifCodec.parseExif(Array.emptyByteArray).isEmpty)
    assert(ExifCodec.parseExif(tagged.take(20)).isEmpty) // truncated mid-segment
    // corrupt the TIFF byte-order mark inside the APP1: parser must reject
    val bad = tagged.clone()
    bad(12) = 'X' // offset 2 (SOI) + 2 (marker) + 2 (len) + 6 (Exif\0\0) = 12
    assert(ExifCodec.parseExif(bad).isEmpty)
    // corrupt the IFD0 offset to point past the segment: reject
    val bad2 = tagged.clone()
    bad2(16) = 0x7f.toByte // IFD0 offset low byte (II) -> far past the payload
    assert(ExifCodec.parseExif(bad2).isEmpty)
  }

  test("parser ignores a non-Exif APP1 and keeps walking") {
    // an APP1 that is NOT Exif (e.g. XMP) followed by the real one
    val xmp = Array[Byte](0xff.toByte, 0xe1.toByte, 0, 8, 'X', 'M', 'P', 0, 1, 2)
    val app1 = ExifCodec.buildApp1(le = false, 3, 96L, 1L, "2021:06:15 12:00:00", 200, 20L)
    val base = jpeg()
    val withExif = ExifCodec.spliceApp1(base, app1).get
    // each splice inserts right after SOI, so the LAST splice lands first:
    // stream order is SOI, XMP-APP1, Exif-APP1 — the walker must skip XMP
    val both = ExifCodec.spliceApp1(withExif, xmp).get
    val ex = ExifCodec.parseExif(both).getOrElse(fail("should find Exif after XMP"))
    assert(ex.orientation == 3 && ex.byteOrder == "MM")
  }
}
