package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the baseline JPEG codec. JPEG is lossy, so unlike
  * the PPM/BMP/PNG/GIF specs these assert RECONSTRUCTION BOUNDS rather
  * than byte equality — plus two exact invariants that must hold even for
  * a lossy codec: decode is deterministic, and restart markers change the
  * byte stream but NOT the decoded pixels. The JDK's own ImageIO JPEG
  * codec (an independent implementation that ships with every JVM) is
  * used as a cross-implementation referee: payloads we encode must decode
  * compatibly there, and payloads IT encodes must decode compatibly here.
  */
class JpegCodecSpec extends AnyFunSuite {
  import ImageCodec.Raster

  private def gradient(w: Int, h: Int): Raster = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = ((x * 255) / math.max(1, w - 1)).toByte
      rgb(o + 1) = ((y * 255) / math.max(1, h - 1)).toByte
      rgb(o + 2) = (((x + y) * 255) / math.max(1, w + h - 2)).toByte
    }
    Raster(w, h, rgb)
  }

  private def flat(w: Int, h: Int, r: Int, g: Int, b: Int): Raster =
    Raster(w, h, Array.tabulate(w * h * 3)(i =>
      (i % 3 match { case 0 => r; case 1 => g; case _ => b }).toByte))

  private def maxDiff(a: Raster, b: Raster): Int = {
    require(a.width == b.width && a.height == b.height, "dims differ")
    a.rgb.zip(b.rgb).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.max
  }

  private def meanDiff(a: Raster, b: Raster): Double = {
    val d = a.rgb.zip(b.rgb).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }
    d.sum.toDouble / d.length
  }

  // ---- ImageIO bridge (test-only referee; the engine never uses AWT)

  private def toBuffered(r: Raster): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      r.width, r.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until r.height; x <- 0 until r.width) {
      val (rr, gg, bb) = r.pixel(x, y)
      img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
    }
    img
  }

  private def fromBuffered(img: java.awt.image.BufferedImage): Raster = {
    val out = new Array[Byte](img.getWidth * img.getHeight * 3)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      val o = (y * img.getWidth + x) * 3
      out(o) = ((p >> 16) & 0xff).toByte
      out(o + 1) = ((p >> 8) & 0xff).toByte
      out(o + 2) = (p & 0xff).toByte
    }
    Raster(img.getWidth, img.getHeight, out)
  }

  private def imageIoDecode(b: Array[Byte]): Raster =
    fromBuffered(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))

  private def imageIoEncodeJpeg(r: Raster, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive) p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(toBuffered(r), null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  private def sofMarker(b: Array[Byte]): Int = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) == 0xff) {
        val m = b(i + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) return m
        if (m != 0xff && m != 0x00 && m != 0xd8) // skip past the segment
          i += 2 + (((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)) - 1
      }
      i += 1
    }
    -1
  }

  // ------------------------------------------------------------- behavior

  test("flat colors survive a 4:4:4 round trip nearly exactly") {
    for ((r, g, b) <- Seq((128, 128, 128), (255, 0, 0), (0, 255, 0),
        (0, 0, 255), (17, 200, 90))) {
      val src = flat(24, 16, r, g, b)
      val dec = JpegCodec.decode(JpegCodec.encode(src, quality = 90)).get
      assert(dec.width == 24 && dec.height == 16)
      assert(maxDiff(src, dec) <= 3, s"flat ($r,$g,$b) drifted > 3 levels")
    }
  }

  test("gradients survive a 4:4:4 q90 round trip within quantization error") {
    val src = gradient(64, 48)
    val dec = JpegCodec.decode(JpegCodec.encode(src, quality = 90)).get
    assert(maxDiff(src, dec) <= 16)
    assert(meanDiff(src, dec) <= 3.0)
  }

  test("4:2:0 subsampling decodes (chroma at quarter resolution) within bounds") {
    val src = gradient(64, 48)
    val dec = JpegCodec.decode(JpegCodec.encode(src, quality = 90, subsample420 = true)).get
    assert(dec.width == 64 && dec.height == 48)
    assert(maxDiff(src, dec) <= 32) // chroma is quarter-res by design
    assert(meanDiff(src, dec) <= 5.0)
  }

  test("odd dimensions (not multiples of the MCU) keep exact width/height") {
    for ((w, h, sub) <- Seq((13, 7, false), (17, 19, true), (1, 1, false),
        (8, 9, true), (33, 16, false))) {
      val src = gradient(w, h)
      val dec = JpegCodec.decode(JpegCodec.encode(src, quality = 90, subsample420 = sub))
      assert(dec.exists(d => d.width == w && d.height == h), s"${w}x$h sub=$sub")
    }
  }

  test("decode is deterministic: same payload, same bytes, twice") {
    val payload = JpegCodec.encode(gradient(40, 24), quality = 80, subsample420 = true)
    val a = JpegCodec.decode(payload).get
    val b = JpegCodec.decode(payload).get
    assert(a.rgb.sameElements(b.rgb))
  }

  test("restart markers change the stream but not one decoded pixel") {
    val src = gradient(48, 32)
    val plain = JpegCodec.encode(src, quality = 85)
    val rst = JpegCodec.encode(src, quality = 85, restartEvery = 2)
    assert(!plain.sameElements(rst), "DRI/RSTn must actually be emitted")
    // DC prediction resets re-code the same quantized values, so pixels
    // must be IDENTICAL, not merely close
    assert(JpegCodec.decode(plain).get.rgb.sameElements(JpegCodec.decode(rst).get.rgb))
    // and 4:2:0 with restarts mid-MCU-row
    val rst420 = JpegCodec.encode(src, quality = 85, subsample420 = true, restartEvery = 1)
    val plain420 = JpegCodec.encode(src, quality = 85, subsample420 = true)
    assert(JpegCodec.decode(plain420).get.rgb.sameElements(JpegCodec.decode(rst420).get.rgb))
  }

  test("cross-implementation: ImageIO decodes our payloads compatibly") {
    val src = gradient(64, 48)
    for (sub <- Seq(false, true)) {
      val payload = JpegCodec.encode(src, quality = 90, subsample420 = sub)
      val ours = JpegCodec.decode(payload).get
      val theirs = imageIoDecode(payload)
      // two decoders, same stream: differences are IDCT rounding plus (for
      // 4:2:0) chroma upsample filter choice — small on a smooth gradient
      assert(meanDiff(ours, theirs) <= 2.0, s"sub=$sub mean drift vs ImageIO")
      assert(maxDiff(ours, theirs) <= 24, s"sub=$sub max drift vs ImageIO")
    }
  }

  test("cross-implementation: we decode ImageIO's payloads compatibly") {
    val src = gradient(64, 48)
    val payload = imageIoEncodeJpeg(src, 0.9f)
    val ours = JpegCodec.decode(payload).get
    val theirs = imageIoDecode(payload)
    assert(ours.width == 64 && ours.height == 48)
    assert(meanDiff(ours, theirs) <= 2.0)
    assert(maxDiff(ours, theirs) <= 24)
  }

  test("progressive (SOF2): decodes ImageIO's multi-scan stream compatibly") {
    val src = gradient(64, 48)
    val payload = imageIoEncodeJpeg(src, 0.9f, progressive = true)
    assert(sofMarker(payload) == 0xc2, "fixture must actually be progressive")
    val ours = JpegCodec.decode(payload).get
    val theirs = imageIoDecode(payload)
    assert(ours.width == 64 && ours.height == 48)
    // the refinement scans must fully reconstruct: same stream, two
    // decoders, differences are IDCT rounding + chroma upsample choice
    assert(meanDiff(ours, theirs) <= 2.0)
    assert(maxDiff(ours, theirs) <= 24)
  }

  test("progressive: odd dims and a busy image reconstruct like the baseline form") {
    // same pixels encoded baseline vs progressive by the SAME writer must
    // decode (by us) to nearly identical rasters — the scan-order
    // machinery may not change the picture
    for ((w, h) <- Seq((37, 23), (16, 16), (9, 31))) {
      val src = Raster(w, h, Array.tabulate(w * h * 3)(i => ((i * 73 + 31) % 256).toByte))
      val base = imageIoEncodeJpeg(src, 0.95f, progressive = false)
      val prog = imageIoEncodeJpeg(src, 0.95f, progressive = true)
      assert(sofMarker(prog) == 0xc2 && sofMarker(base) != 0xc2)
      val a = JpegCodec.decode(base).get
      val b = JpegCodec.decode(prog).get
      assert(a.width == w && b.width == w && a.height == h && b.height == h)
      assert(meanDiff(a, b) <= 1.0, s"${w}x$h baseline-vs-progressive drift")
      assert(maxDiff(a, b) <= 8, s"${w}x$h baseline-vs-progressive max drift")
    }
  }

  test("progressive grayscale decodes; truncation at any boundary stays total") {
    val img = new java.awt.image.BufferedImage(
      24, 17, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 17; x <- 0 until 24)
      img.getRaster.setSample(x, y, 0, (x * 11 + y * 5) & 0xff)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    val payload = bos.toByteArray
    assert(sofMarker(payload) == 0xc2)
    val ours = JpegCodec.decode(payload).get
    assert(ours.width == 24 && ours.height == 17)
    assert((0 until 24 * 17).forall { i =>
      ours.rgb(i * 3) == ours.rgb(i * 3 + 1) && ours.rgb(i * 3 + 1) == ours.rgb(i * 3 + 2)
    })
    // totality: every prefix is rejected or decodes without throwing
    var len = 0
    while (len < payload.length - 2) {
      JpegCodec.decode(payload.take(len)) // must not throw
      len += 7 // stride for speed; boundaries within segments still hit
    }
  }

  test("grayscale (single-component) JPEG decodes to replicated gray") {
    val img = new java.awt.image.BufferedImage(
      32, 20, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 20; x <- 0 until 32) {
      val g = (x * 8 + y) & 0xff
      img.getRaster.setSample(x, y, 0, g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val ours = JpegCodec.decode(bos.toByteArray).get
    assert(ours.width == 32 && ours.height == 20)
    // every pixel must be gray (R == G == B) by the replication contract
    assert((0 until 32 * 20).forall { i =>
      val (r, g, b) = (ours.rgb(i * 3) & 0xff, ours.rgb(i * 3 + 1) & 0xff,
        ours.rgb(i * 3 + 2) & 0xff)
      r == g && g == b
    })
    // compare against the RAW samples that were written (ImageIO's getRGB
    // view of TYPE_BYTE_GRAY applies a linear-gray -> sRGB gamma ramp and
    // is NOT the codec's output; the decoded Y must track the input Y)
    val diffs = for (y <- 0 until 20; x <- 0 until 32)
      yield math.abs((ours.rgb((y * 32 + x) * 3) & 0xff) - ((x * 8 + y) & 0xff))
    assert(diffs.sum.toDouble / diffs.length <= 4.0, "gray drift vs source samples")
  }

  test("dispatch: ImageCodec.decodeImage routes JPEG magic to this codec") {
    val payload = JpegCodec.encode(flat(8, 8, 10, 20, 30), quality = 95)
    val viaDispatch = ImageCodec.decodeImage(payload)
    assert(viaDispatch.exists(r => r.width == 8 && r.height == 8))
  }

  // ------------------------------------------------------------- totality

  test("truncation at any byte boundary returns None, never throws") {
    val payload = JpegCodec.encode(gradient(24, 16), quality = 85)
    // every prefix short of the EOI marker is a corrupt payload
    var len = 0
    while (len < payload.length - 2) {
      assert(JpegCodec.decode(payload.take(len)).isEmpty, s"prefix $len decoded")
      len += 1
    }
  }

  test("lossless / arithmetic / 12-bit SOF classes are rejected, not misread") {
    val base = JpegCodec.encode(flat(8, 8, 1, 2, 3), quality = 85)
    // rewrite the SOF0 marker byte (FF C0) to each unsupported SOF class
    val sofAt = {
      var i = 2
      while (!((base(i) & 0xff) == 0xff && (base(i + 1) & 0xff) == 0xc0)) i += 1
      i + 1
    }
    // 0xc2 included: a BASELINE scan header relabeled progressive is a
    // malformed progressive stream (DC+AC in one scan) and must reject
    for (m <- Seq(0xc2, 0xc3, 0xc5, 0xc9, 0xcb, 0xcf)) {
      val mut = base.clone(); mut(sofAt) = m.toByte
      assert(JpegCodec.decode(mut).isEmpty, f"SOF $m%02x accepted")
    }
    // 12-bit precision flag
    val mut12 = base.clone(); mut12(sofAt + 3) = 12.toByte
    assert(JpegCodec.decode(mut12).isEmpty, "12-bit precision accepted")
  }

  test("poison payloads: header-only, garbage body, overflow dims — all None") {
    assert(JpegCodec.decode(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)).isEmpty)
    assert(JpegCodec.decode(Array[Byte]()).isEmpty)
    val garbage = Array.tabulate(512)(i => (i * 73 + 19).toByte)
    garbage(0) = 0xff.toByte; garbage(1) = 0xd8.toByte; garbage(2) = 0xff.toByte
    assert(JpegCodec.decode(garbage).isEmpty)
  }
}
