package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import TiffCodec._
import ImageCodec.Raster

class TiffCodecSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int): Raster =
    Raster(w, h, Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte))

  private def grayBytes(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(p => ((p * 29 + 5) % 256).toByte)

  test("encode -> decode round trip preserves every pixel") {
    for ((w, h) <- Seq((1, 1), (5, 3), (16, 16), (33, 7))) {
      val r = raster(w, h)
      val dec = decodeTiff(encodeTiff(r)).get
      assert((dec.width, dec.height) == (w, h))
      assert(dec.rgb.toSeq == r.rgb.toSeq)
    }
  }

  test("encoded TIFF cross-checks against the JDK ImageIO reader") {
    val r = raster(13, 9)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(encodeTiff(r)))
    assert(img != null, "ImageIO must accept our baseline TIFF")
    assert((img.getWidth, img.getHeight) == (13, 9))
    for (y <- 0 until 9; x <- 0 until 13) {
      val p = (y * 13 + x) * 3
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == (r.rgb(p) & 0xff), s"R($x,$y)")
      assert(((rgb >> 8) & 0xff) == (r.rgb(p + 1) & 0xff), s"G($x,$y)")
      assert((rgb & 0xff) == (r.rgb(p + 2) & 0xff), s"B($x,$y)")
    }
  }

  test("gray8 decodes with photometric polarity: BlackIsZero direct, WhiteIsZero inverted") {
    val w = 7; val h = 4
    val g = grayBytes(w, h)
    val black = decodeTiff(tiffContainer(w, h, 1, 1, 1, h, Seq(g))).get
    val white = decodeTiff(tiffContainer(w, h, 1, 0, 1, h, Seq(g))).get
    for (p <- 0 until w * h) {
      val v = g(p) & 0xff
      assert((black.rgb(p * 3) & 0xff) == v && (black.rgb(p * 3 + 2) & 0xff) == v)
      assert((white.rgb(p * 3) & 0xff) == 255 - v)
    }
  }

  test("big-endian (MM) parses identically to little-endian (II)") {
    val w = 6; val h = 5
    val g = grayBytes(w, h)
    val le = decodeTiff(tiffContainer(w, h, 1, 1, 1, h, Seq(g))).get
    val be = decodeTiff(tiffContainer(w, h, 1, 1, 1, h, Seq(g), bigEndian = true)).get
    assert(le.rgb.toSeq == be.rgb.toSeq)
    val rgb = raster(4, 3)
    val rows = rgb.rgb.grouped(4 * 3).toSeq.map(_.toArray)
    val beRgb = decodeTiff(tiffContainer(4, 3, 3, 2, 1, 1, rows, bigEndian = true)).get
    assert(beRgb.rgb.toSeq == rgb.rgb.toSeq)
  }

  test("multi-strip assembly equals single-strip for the same pixels") {
    val w = 8; val h = 10; val rps = 3 // strips of 3,3,3,1 rows
    val g = grayBytes(w, h)
    val strips = g.grouped(w * rps).map(_.toArray).toSeq
    assert(strips.length == 4)
    val multi = decodeTiff(tiffContainer(w, h, 1, 1, 1, rps, strips)).get
    val single = decodeTiff(tiffContainer(w, h, 1, 1, 1, h, Seq(g))).get
    assert(multi.rgb.toSeq == single.rgb.toSeq)
    // strip count inconsistent with rowsPerStrip: reject
    assert(decodeTiff(tiffContainer(w, h, 1, 1, 1, rps, Seq(g))).isEmpty)
  }

  test("PackBits: spec anchors, greedy compressor round-trips, compressed strips decode") {
    // TIFF 6.0 Section 9 worked example decodes via a container round-trip
    assert(packBits(Array[Byte](1, 1, 1)).toSeq == Seq[Byte](-2, 1))
    assert(packBits(Array[Byte](1, 2, 3)).toSeq == Seq[Byte](2, 1, 2, 3))
    val mixed: Array[Byte] = Array.tabulate(300)(i => if (i / 7 % 2 == 0) 42 else (i % 11).toByte)
    for (d <- Seq(grayBytes(16, 16), mixed, Array.fill[Byte](300)(9), Array[Byte](5))) {
      val w = d.length; val packed = packBits(d)
      val dec = decodeTiff(tiffContainer(w, 1, 1, 1, 32773, 1, Seq(packed))).get
      assert(dec.rgb.grouped(3).map(_(0)).toSeq == d.toSeq, "packbits round trip")
    }
    // per-strip compression with multiple strips
    val w = 9; val h = 6; val rps = 2
    val g = grayBytes(w, h)
    val strips = g.grouped(w * rps).map(s => packBits(s.toArray)).toSeq
    val dec = decodeTiff(tiffContainer(w, h, 1, 1, 32773, rps, strips)).get
    assert(dec.rgb.grouped(3).map(_(0)).toSeq == g.toSeq)
    // a -128 no-op control byte is skipped
    val noop = Array[Byte](-128) ++ packBits(Array[Byte](7, 7, 7, 7))
    val dec2 = decodeTiff(tiffContainer(4, 1, 1, 1, 32773, 1, Seq(noop))).get
    assert(dec2.rgb.grouped(3).map(_(0) & 0xff).toSeq == Seq(7, 7, 7, 7))
  }

  test("ImageIO cross-check on a PackBits gray big-endian container") {
    val w = 11; val h = 5
    val g = grayBytes(w, h)
    val bytes = tiffContainer(w, h, 1, 1, 32773, h, Seq(packBits(g)), bigEndian = true)
    val ours = decodeTiff(bytes).get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO must accept the PackBits gray TIFF")
    // raw raster samples (getRGB would gamma-convert gray -> sRGB)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) == (ours.rgb((y * w + x) * 3) & 0xff), s"($x,$y)")
  }

  test("TIFF-LZW strips decode: literal stream, early-change re-clear, predictor 2") {
    // gray literal stream through the real MSB-first 9-bit walk
    val w = 19; val h = 7
    val g = grayBytes(w, h)
    val lzw = decodeTiff(tiffContainer(w, h, 1, 1, 5, h, Seq(lzwTiffLiteralStream(g)))).get
    val flat = decodeTiff(tiffContainer(w, h, 1, 1, 1, h, Seq(g))).get
    assert(lzw.rgb.toSeq == flat.rgb.toSeq)
    // a stream long enough to force the mid-stream re-Clear (253+ bytes)
    val long = Array.tabulate[Byte](600)(i => ((i * 31 + 7) % 256).toByte)
    val dec = decodeTiff(tiffContainer(600, 1, 1, 1, 5, 1, Seq(lzwTiffLiteralStream(long)))).get
    assert(dec.rgb.grouped(3).map(_(0)).toSeq == long.toSeq)
    // predictor 2: encode row-differences, decoder re-accumulates
    val rgb = raster(9, 4)
    val diffed = rgb.rgb.clone()
    for (y <- 3 to 0 by -1; x <- (9 - 1) to 1 by -1; c <- 0 until 3) {
      val p = (y * 9 + x) * 3 + c
      diffed(p) = ((rgb.rgb(p) - rgb.rgb(p - 3)) & 0xff).toByte
    }
    val rows = diffed.grouped(9 * 3).map(r => lzwTiffLiteralStream(r.toArray)).toSeq
    val pred = decodeTiff(tiffContainer(9, 4, 3, 2, 5, 1, rows, predictor = 2)).get
    assert(pred.rgb.toSeq == rgb.rgb.toSeq, "horizontal differencing must re-accumulate")
    // ImageIO cross-check on the LZW gray container
    val bytes = tiffContainer(w, h, 1, 1, 5, h, Seq(lzwTiffLiteralStream(g)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO must accept our TIFF-LZW stream")
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) == (g(y * w + x) & 0xff), s"($x,$y)")
    // truncated LZW stream (EOI missing) rejects
    val cut = lzwTiffLiteralStream(g)
    assert(decodeTiff(tiffContainer(w, h, 1, 1, 5, h,
      Seq(java.util.Arrays.copyOf(cut, cut.length - 2)))).isEmpty)
    // predictor 3 (floating-point) rejects
    assert(decodeTiff(tiffContainer(w, h, 1, 1, 5, h,
      Seq(lzwTiffLiteralStream(g)), predictor = 3)).isEmpty)
  }

  test("totality fuzz: corrupted and truncated TIFFs (incl. LZW/PackBits strips) never throw") {
    val rnd = new scala.util.Random(19)
    val bases = Seq(
      encodeTiff(raster(9, 7)),
      tiffContainer(11, 5, 1, 0, 32773, 2,
        grayBytes(11, 5).grouped(22).map(s => packBits(s.toArray)).toSeq, bigEndian = true),
      tiffContainer(8, 6, 1, 1, 5, 6, Seq(lzwTiffLiteralStream(grayBytes(8, 6)))))
    for (base <- bases; _ <- 1 to 120) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(3))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      decodeTiff(m) // Some or None, never a throw
      decodeTiff(java.util.Arrays.copyOf(m, rnd.nextInt(m.length + 1)))
      ()
    }
  }

  test("unsupported layouts reject: depth, planar, palette, LZW, alpha, truncation, magic") {
    val ok = encodeTiff(raster(4, 4))
    assert(decodeTiff(ok).isDefined)
    // wrong magic / order mark
    assert(decodeTiff("GIF89a".getBytes).isEmpty)
    val badMagic = ok.clone(); badMagic(2) = 43
    assert(decodeTiff(badMagic).isEmpty)
    // 16-bit samples (bits inline SHORT count 1)
    val g = grayBytes(3, 3)
    val c16 = tiffContainer(3, 3, 1, 1, 1, 3, Seq(g))
    // tag 258 is entry index 2; patch its inlined value 8 -> 16
    val e258 = 8 + 2 + 2 * 12
    assert(c16(e258) == 2 && c16(e258 + 1) == 1, "entry 2 is tag 258 (0x0102, LE)")
    c16(e258 + 8) = 16
    assert(decodeTiff(c16).isEmpty)
    // palette color (photometric 3) / deflate (compression 8)
    assert(decodeTiff(tiffContainer(3, 3, 1, 3, 1, 3, Seq(g))).isEmpty)
    assert(decodeTiff(tiffContainer(3, 3, 1, 1, 8, 3, Seq(g))).isEmpty)
    // raw bytes masquerading as an LZW strip reject, not misrender
    assert(decodeTiff(tiffContainer(3, 3, 1, 1, 5, 3, Seq(g))).isEmpty)
    // truncated strip data
    val short = tiffContainer(4, 4, 1, 1, 1, 4, Seq(grayBytes(4, 4)))
    assert(decodeTiff(java.util.Arrays.copyOf(short, short.length - 5)).isEmpty)
    // PackBits stream that under-fills its strip
    assert(decodeTiff(tiffContainer(8, 1, 1, 1, 32773, 1,
      Seq(packBits(Array.fill[Byte](4)(1))))).isEmpty)
    // decodeImage dispatches TIFF by magic
    assert(ImageCodec.decodeImage(ok).isDefined)
  }
}
