package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pixel-level pins for the pure-JVM uncompressed codecs: PPM P6 grammar
  * (comments, whitespace, maxval bounds, truncation), 24-bit BMP (bottom-up
  * row order, 4-byte row padding, top-down negative height, BGR->RGB), the
  * PPM-stream container, and the exactly-specified nearest-neighbor
  * resample. Everything asserted byte-for-byte — the repo's determinism
  * rule applied to pixels.
  */
class ImageCodecSpec extends AnyFunSuite {
  import ImageCodec._

  private def ppm(w: Int, h: Int, px: Seq[(Int, Int, Int)],
      header: String = ""): Array[Byte] = {
    val hdr = if (header.nonEmpty) header else s"P6\n$w $h\n255\n"
    hdr.getBytes("US-ASCII") ++ px.flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte) }
  }

  private val px4x2 = Seq( // row 0 then row 1, distinct channel patterns
    (10, 0, 0), (20, 0, 0), (30, 0, 0), (40, 0, 0),
    (0, 50, 1), (0, 60, 2), (0, 70, 3), (0, 80, 4))

  test("PPM P6 decode: dimensions and every pixel") {
    val r = decodeImage(ppm(4, 2, px4x2)).get
    assert((r.width, r.height) == (4, 2))
    for (y <- 0 until 2; x <- 0 until 4)
      assert(r.pixel(x, y) == px4x2(y * 4 + x))
  }

  test("PPM header grammar: comments and mixed whitespace accepted") {
    val hdr = "P6 # netpbm allows comments\n# full-line comment\n 4\t2 # dims\n255\n"
    val r = decodeImage(ppm(4, 2, px4x2, hdr)).get
    assert((r.width, r.height) == (4, 2))
    assert(r.pixel(3, 1) == ((0, 80, 4)))
  }

  test("PPM rejects: 2-byte samples, truncation, bad magic — all None, no throw") {
    assert(decodeImage(ppm(4, 2, px4x2, "P6\n4 2\n65535\n")).isEmpty, "maxval>255")
    assert(decodeImage(ppm(4, 2, px4x2).dropRight(1)).isEmpty, "truncated body")
    assert(decodeImage("P6\n4\n".getBytes("US-ASCII")).isEmpty, "truncated header")
    assert(decodeImage(ppm(4, 2, px4x2, "P5\n4 2\n255\n")).isEmpty, "P5 not P6")
    assert(decodeImage(Array[Byte]()).isEmpty)
  }

  /** Hand-built 24bpp BI_RGB BMP: rows bottom-up unless topDown, BGR,
    * padded to 4-byte multiples.
    */
  private def bmp(w: Int, h: Int, px: Seq[(Int, Int, Int)],
      topDown: Boolean = false): Array[Byte] = {
    val rowSize = ((24 * w + 31) / 32) * 4
    val dataSize = rowSize * h
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)               // file header
    out.putInt(40).putInt(w).putInt(if (topDown) -h else h)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)    // info header
    val storedRows = if (topDown) 0 until h else (h - 1) to 0 by -1
    for (y <- storedRows) {
      for (x <- 0 until w) {
        val (r, g, b) = px(y * w + x)
        out.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      for (_ <- 0 until rowSize - w * 3) out.put(0.toByte)
    }
    out.array()
  }

  test("BMP decode: bottom-up storage with row padding comes back top-down RGB") {
    // w=3 -> 9 data bytes/row, padded to 12: padding handling is load-bearing
    val px = Seq((1, 2, 3), (4, 5, 6), (7, 8, 9),
                 (10, 11, 12), (13, 14, 15), (16, 17, 18))
    val r = decodeBmp(bmp(3, 2, px)).get
    assert((r.width, r.height) == (3, 2))
    for (y <- 0 until 2; x <- 0 until 3) assert(r.pixel(x, y) == px(y * 3 + x))
  }

  test("BMP decode: negative height means top-down storage — same logical image") {
    val px = Seq((1, 2, 3), (4, 5, 6), (7, 8, 9),
                 (10, 11, 12), (13, 14, 15), (16, 17, 18))
    val bu = decodeBmp(bmp(3, 2, px)).get
    val td = decodeBmp(bmp(3, 2, px, topDown = true)).get
    assert(bu.rgb.toSeq == td.rgb.toSeq)
  }

  test("BMP rejects: 32bpp, RLE compression, truncation — all None") {
    val good = bmp(3, 2, Seq.fill(6)((1, 2, 3)))
    val bpp32 = good.clone(); bpp32(28) = 32
    assert(decodeBmp(bpp32).isEmpty)
    val rle = good.clone(); rle(30) = 1
    assert(decodeBmp(rle).isEmpty)
    assert(decodeBmp(good.dropRight(5)).isEmpty)
    assert(decodeBmp("BMxx".getBytes).isEmpty)
  }

  test("PPM and BMP of the same pixels decode to identical rasters") {
    assert(decodeImage(ppm(4, 2, px4x2)).get.rgb.toSeq
      == decodeBmp(bmp(4, 2, px4x2)).get.rgb.toSeq)
  }

  test("PPM stream: all frames decoded, truncated tail rejects the payload") {
    val f0 = ppm(2, 1, Seq((1, 1, 1), (2, 2, 2)))
    val f1 = ppm(2, 1, Seq((3, 3, 3), (4, 4, 4)))
    val f2 = ppm(1, 2, Seq((5, 5, 5), (6, 6, 6))) // dims may vary per frame
    val fs = decodePpmStream(f0 ++ f1 ++ f2).get
    assert(fs.length == 3)
    assert(fs(1).pixel(1, 0) == ((4, 4, 4)))
    assert(fs(2).height == 2)
    assert(decodePpmStream(f0 ++ f1.dropRight(1)).isEmpty, "truncated tail = corrupt")
  }

  test("encodePpm round-trips through decode") {
    val r = decodeImage(ppm(4, 2, px4x2)).get
    val back = decodeImage(encodePpm(r)).get
    assert(back.rgb.toSeq == r.rgb.toSeq && back.width == 4 && back.height == 2)
  }

  test("nearest-neighbor resample: exact floor mapping, hand-computed output") {
    val r = decodeImage(ppm(4, 2, px4x2)).get
    val out = resizeNearest(r, 2, 1)
    // sx = x*4/2 -> {0, 2}; sy = 0*2/1 -> 0
    assert(out.pixel(0, 0) == ((10, 0, 0)))
    assert(out.pixel(1, 0) == ((30, 0, 0)))
    // identity target returns the same raster unchanged
    assert(resizeNearest(r, 4, 2).rgb.toSeq == r.rgb.toSeq)
    // upscale mapping is also exact: 4x2 -> 8x2 duplicates each column
    val up = resizeNearest(r, 8, 2)
    for (x <- 0 until 8; y <- 0 until 2)
      assert(up.pixel(x, y) == r.pixel(x / 2, y))
  }
}
