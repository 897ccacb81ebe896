package graft.ops

/** ICO icon container (the Windows icon / web-favicon format — a
  * directory of independently-encoded images, the form favicons take in
  * a web crawl). Public layout: ICONDIR (reserved=0, type=1, count),
  * 16-byte ICONDIRENTRY per image (width/height bytes where 0 means 256,
  * byte size, data offset), then per image EITHER a complete PNG file
  * (modern 256px members) OR a "BMP member": a BITMAPINFOHEADER whose
  * biHeight counts BOTH the XOR pixel rows and the 1bpp AND transparency
  * mask (so biHeight = 2×height), no BITMAPFILEHEADER, bottom-up rows,
  * rows padded to 32 bits.
  *
  * Supported BMP members: 32bpp BGRA, 24bpp BGR, 8bpp palette; the AND
  * mask is APPLIED — masked-out pixels render as black, the documented
  * composite-onto-black of a raster contract that carries no alpha
  * (same adjudication as the PNG/GIF planes: stats/thumbnail kernel, not
  * display). PNG members ride the existing [[ImageCodec.decodePng]].
  * Totality: bad directory arithmetic, overlapping/out-of-range data,
  * unsupported depth/compression, or a member that fails its own codec
  * all return None.
  */
object IcoCodec {

  def looksLikeIco(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 0 && b(1) == 0 && b(2) == 1 && b(3) == 0 &&
      (u16(b, 4) > 0)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  /** Decode every member of an ICO; None on any malformation. */
  def decodeIco(b: Array[Byte]): Option[Vector[ImageCodec.Raster]] = {
    try {
      if (!looksLikeIco(b)) return None
      val count = u16(b, 4)
      if (6 + count * 16 > b.length) return None
      var out = Vector.empty[ImageCodec.Raster]
      var k = 0
      while (k < count) {
        val e = 6 + k * 16
        val size = u32(b, e + 8)
        val off = u32(b, e + 12)
        if (off < 6 + count * 16 || off + size > b.length || size < 8) return None
        val data = java.util.Arrays.copyOfRange(b, off.toInt, (off + size).toInt)
        val img =
          if (ImageCodec.looksLikePng(data)) ImageCodec.decodePng(data)
          else decodeBmpMember(data)
        out :+= img.getOrElse(return None)
        k += 1
      }
      if (out.isEmpty) None else Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** A headerless BMP member: BITMAPINFOHEADER with doubled height, XOR
    * rows bottom-up, then the 1bpp AND mask (32-bit-padded rows) applied
    * as composite-onto-black.
    */
  private def decodeBmpMember(b: Array[Byte]): Option[ImageCodec.Raster] = {
    if (b.length < 40) return None
    val hdrSize = i32(b, 0)
    if (hdrSize < 40) return None
    val w = i32(b, 4)
    val h2 = i32(b, 8)
    val planes = u16(b, 12)
    val bpp = u16(b, 14)
    val comp = i32(b, 16)
    if (w <= 0 || h2 <= 0 || h2 % 2 != 0 || planes != 1 || comp != 0) return None
    val h = h2 / 2
    if (w.toLong * h * 3 > Int.MaxValue || w.toLong * h > (1L << 26)) return None
    val nPal = if (bpp == 8) { val c = i32(b, 32); if (c == 0) 256 else c } else 0
    if (nPal > 256) return None
    var o = hdrSize + nPal * 4
    val xorStride = ((w * bpp + 31) / 32) * 4
    val andStride = ((w + 31) / 32) * 4
    if (o + h.toLong * xorStride + h.toLong * andStride > b.length) return None
    val out = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      val y = h - 1 - row // bottom-up
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 3
        bpp match {
          case 32 =>
            val s = o + row * xorStride + x * 4
            out(d) = b(s + 2); out(d + 1) = b(s + 1); out(d + 2) = b(s) // BGRA
          case 24 =>
            val s = o + row * xorStride + x * 3
            out(d) = b(s + 2); out(d + 1) = b(s + 1); out(d + 2) = b(s)
          case 8 =>
            val idx = b(o + row * xorStride + x) & 0xff
            if (idx >= nPal) return None
            val p = hdrSize + idx * 4
            out(d) = b(p + 2); out(d + 1) = b(p + 1); out(d + 2) = b(p) // BGRX
          case _ => return None
        }
        x += 1
      }
      row += 1
    }
    // AND mask: set bit -> transparent -> composite onto black
    val mo = o + h * xorStride
    row = 0
    while (row < h) {
      val y = h - 1 - row
      var x = 0
      while (x < w) {
        val bit = (b(mo + row * andStride + (x >> 3)) >> (7 - (x & 7))) & 1
        if (bit != 0) {
          val d = (y * w + x) * 3
          out(d) = 0; out(d + 1) = 0; out(d + 2) = 0
        }
        x += 1
      }
      row += 1
    }
    Some(ImageCodec.Raster(w, h, out))
  }

  /** Writer twin: each raster becomes a member — `asPng(k)` selects a PNG
    * member, otherwise a 24bpp BMP member whose AND mask is supplied per
    * pixel by `masked` (row-major top-down; masked pixels decode black).
    */
  def buildIco(images: Seq[ImageCodec.Raster], asPng: Int => Boolean = _ => false,
      masked: (Int, Int, Int) => Boolean = (_, _, _) => false): Option[Array[Byte]] = {
    if (images.isEmpty || images.exists(r => r.width > 256 || r.height > 256)) return None
    val blobs = images.zipWithIndex.map { case (r, k) =>
      if (asPng(k)) ImageCodec.encodePng(r)
      else {
        val bos = new java.io.ByteArrayOutputStream()
        def w32(v: Int): Unit = {
          bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
          bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
        }
        def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
        w32(40); w32(r.width); w32(r.height * 2)
        w16(1); w16(24); w32(0); w32(0); w32(0); w32(0); w32(0); w32(0)
        val xorStride = ((r.width * 24 + 31) / 32) * 4
        val andStride = ((r.width + 31) / 32) * 4
        var row = r.height - 1 // bottom-up
        while (row >= 0) {
          var x = 0
          while (x < r.width) {
            val s = (row * r.width + x) * 3
            bos.write(r.rgb(s + 2)); bos.write(r.rgb(s + 1)); bos.write(r.rgb(s))
            x += 1
          }
          var pad = xorStride - r.width * 3
          while (pad > 0) { bos.write(0); pad -= 1 }
          row -= 1
        }
        row = r.height - 1
        while (row >= 0) {
          val mrow = new Array[Byte](andStride)
          var x = 0
          while (x < r.width) {
            if (masked(k, x, row)) mrow(x >> 3) = (mrow(x >> 3) | (1 << (7 - (x & 7)))).toByte
            x += 1
          }
          bos.write(mrow)
          row -= 1
        }
        bos.toByteArray
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(0); bos.write(0); bos.write(1); bos.write(0)
    bos.write(images.size & 0xff); bos.write((images.size >> 8) & 0xff)
    var off = 6 + images.size * 16
    images.zip(blobs).foreach { case (r, blob) =>
      bos.write(if (r.width == 256) 0 else r.width)
      bos.write(if (r.height == 256) 0 else r.height)
      bos.write(0); bos.write(0)
      bos.write(1); bos.write(0) // planes
      bos.write(24); bos.write(0) // bitcount hint (informational)
      var v = blob.length
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
      v = off
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
      off += blob.length
    }
    blobs.foreach(bos.write)
    Some(bos.toByteArray)
  }
}
