package graft.ops

/** QOI ("Quite OK Image", qoiformat.org — public one-page spec): the
  * byte-oriented lossless format game/asset pipelines use where PNG's
  * DEFLATE costs too much CPU. Fifth image family in the codec plane,
  * and a different compression SHAPE from all of them: no entropy coder
  * at all — a running 64-slot color index, delta ops, and run-lengths
  * over a single forward pass.
  *
  * Ops (2-bit tags, 8-bit tags win): QOI_OP_RGB (0xfe), QOI_OP_RGBA
  * (0xff), QOI_OP_INDEX (00xxxxxx — slot of hash r*3+g*5+b*7+a*11 mod
  * 64), QOI_OP_DIFF (01drdgdb — channel deltas −2..1, bias 2, wrapping),
  * QOI_OP_LUMA (10dggggg dr−dg+8 db−dg+8 — dg −32..31 bias 32, wrapping),
  * QOI_OP_RUN (11rrrrrr — run 1..62; 63/64 are the RGB/RGBA tags).
  * Stream ends with seven 0x00 then 0x01. Header: "qoif", width/height
  * u32 BE, channels (3/4), colorspace (0/1).
  *
  * Decoder totality matches the codec family: bad magic, zero/overflow
  * dimensions, a stream that ends before the pixel count, or a missing
  * end marker return None. Alpha is carried through the index hash but
  * dropped on output ([[ImageCodec.Raster]] is RGB — the stats/thumbnail
  * contract of the plane).
  */
object QoiCodec {

  def looksLikeQoi(b: Array[Byte]): Boolean =
    b.length >= 14 && b(0) == 'q' && b(1) == 'o' && b(2) == 'i' && b(3) == 'f'

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Decode a QOI image to packed RGB; None on any malformation. */
  def decodeQoi(b: Array[Byte]): Option[ImageCodec.Raster] = {
    try {
      if (!looksLikeQoi(b)) return None
      val w = u32be(b, 4)
      val h = u32be(b, 8)
      val ch = b(12) & 0xff
      val cs = b(13) & 0xff
      if (w <= 0 || h <= 0 || (ch != 3 && ch != 4) || cs > 1) return None
      if (w * h * 3 > Int.MaxValue || w * h > (1L << 26)) return None // bound alloc
      val nPx = (w * h).toInt
      val out = new Array[Byte](nPx * 3)
      val index = new Array[Int](64) // packed rgba
      var r = 0; var g = 0; var bl = 0; var a = 255
      var p = 0
      var i = 14
      while (p < nPx) {
        if (i >= b.length - 8) return None // must leave room for the end marker
        val b1 = b(i) & 0xff
        i += 1
        if (b1 == 0xfe) { // RGB
          if (i + 3 > b.length - 8) return None
          r = b(i) & 0xff; g = b(i + 1) & 0xff; bl = b(i + 2) & 0xff
          i += 3
        } else if (b1 == 0xff) { // RGBA
          if (i + 4 > b.length - 8) return None
          r = b(i) & 0xff; g = b(i + 1) & 0xff; bl = b(i + 2) & 0xff; a = b(i + 3) & 0xff
          i += 4
        } else (b1 >> 6) match {
          case 0 => // INDEX
            val v = index(b1 & 0x3f)
            r = (v >>> 24) & 0xff; g = (v >>> 16) & 0xff; bl = (v >>> 8) & 0xff; a = v & 0xff
          case 1 => // DIFF (wrapping)
            r = (r + ((b1 >> 4) & 3) - 2) & 0xff
            g = (g + ((b1 >> 2) & 3) - 2) & 0xff
            bl = (bl + (b1 & 3) - 2) & 0xff
          case 2 => // LUMA
            if (i + 1 > b.length - 8) return None
            val dg = (b1 & 0x3f) - 32
            val b2 = b(i) & 0xff
            i += 1
            r = (r + dg + ((b2 >> 4) & 0xf) - 8) & 0xff
            g = (g + dg) & 0xff
            bl = (bl + dg + (b2 & 0xf) - 8) & 0xff
          case _ => // RUN of 1..62 COPIES of the previous pixel
            var run = (b1 & 0x3f) + 1
            if (p + run > nPx) return None
            while (run > 0) {
              out(p * 3) = r.toByte; out(p * 3 + 1) = g.toByte; out(p * 3 + 2) = bl.toByte
              p += 1; run -= 1
            }
            p -= 1 // shared tail emit below re-adds the last pixel
        }
        if ((b1 >> 6) != 3 || b1 == 0xfe || b1 == 0xff) {
          out(p * 3) = r.toByte; out(p * 3 + 1) = g.toByte; out(p * 3 + 2) = bl.toByte
        }
        if ((b1 >> 6) != 3 || b1 == 0xfe || b1 == 0xff)
          index((r * 3 + g * 5 + bl * 7 + a * 11) % 64) = (r << 24) | (g << 16) | (bl << 8) | a
        p += 1
      }
      // end marker: seven 0x00 then 0x01, and nothing after
      if (i + 8 != b.length) return None
      var k = 0
      while (k < 7) { if (b(i + k) != 0) return None; k += 1 }
      if (b(i + 7) != 1) return None
      Some(ImageCodec.Raster(w.toInt, h.toInt, out))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode packed RGB as QOI (channels=3, linear colorspace), using the
    * spec's op preference: RUN > INDEX > DIFF > LUMA > RGB.
    */
  def encodeQoi(img: ImageCodec.Raster): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write('q'); bos.write('o'); bos.write('i'); bos.write('f')
    def w32(v: Int): Unit = {
      bos.write((v >>> 24) & 0xff); bos.write((v >>> 16) & 0xff)
      bos.write((v >>> 8) & 0xff); bos.write(v & 0xff)
    }
    w32(img.width); w32(img.height); bos.write(3); bos.write(1)
    val index = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0
    val a = 255
    var run = 0
    var p = 0
    val nPx = img.width * img.height
    while (p < nPx) {
      val r = img.rgb(p * 3) & 0xff
      val g = img.rgb(p * 3 + 1) & 0xff
      val b = img.rgb(p * 3 + 2) & 0xff
      // p == 0 with pr/pg/pb = (0,0,0) is a legal run start: the spec's
      // implicit pre-stream previous pixel is (0,0,0,255), so a leading
      // run of black pixels RUN-encodes like any other
      if (r == pr && g == pg && b == pb && run < 62) run += 1
      else {
        if (run > 0) { bos.write(0xc0 | (run - 1)); run = 0 }
        val slot = (r * 3 + g * 5 + b * 7 + a * 11) % 64
        val packed = (r << 24) | (g << 16) | (b << 8) | a
        if (r == pr && g == pg && b == pb) run = 1 // run hit 62: start a fresh run
        else if (index(slot) == packed) bos.write(slot)
        else {
          index(slot) = packed
          // deltas wrap mod 256 into −128..127 (spec: "wraparound")
          def wrap(d: Int): Int = { val m = d & 0xff; if (m >= 128) m - 256 else m }
          val wdr = wrap(r - pr); val wdg = wrap(g - pg); val wdb = wrap(b - pb)
          if (wdr >= -2 && wdr <= 1 && wdg >= -2 && wdg <= 1 && wdb >= -2 && wdb <= 1)
            bos.write(0x40 | ((wdr + 2) << 4) | ((wdg + 2) << 2) | (wdb + 2))
          else {
            val drg = wrap(wdr - wdg); val dbg = wrap(wdb - wdg)
            if (wdg >= -32 && wdg <= 31 && drg >= -8 && drg <= 7 && dbg >= -8 && dbg <= 7) {
              bos.write(0x80 | (wdg + 32)); bos.write(((drg + 8) << 4) | (dbg + 8))
            } else {
              bos.write(0xfe); bos.write(r); bos.write(g); bos.write(b)
            }
          }
        }
      }
      pr = r; pg = g; pb = b
      p += 1
    }
    if (run > 0) bos.write(0xc0 | (run - 1))
    var k = 0
    while (k < 7) { bos.write(0); k += 1 }
    bos.write(1)
    bos.toByteArray
  }
}
