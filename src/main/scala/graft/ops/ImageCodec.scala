package graft.ops

/** Pure-JVM codecs for uncompressed raster formats — the real decode kernel
  * behind [[MultimodalOps]] (no external codec library exists in this
  * environment, and none is needed for these formats):
  *
  *   - PPM `P6` (binary, 8-bit): the netpbm interchange format.
  *   - BMP, 24-bit uncompressed `BI_RGB`, bottom-up or top-down.
  *   - PPM *streams* (back-to-back `P6` images in one payload) as the video
  *     container — the exact byte format ffmpeg's `image2pipe` muxer emits
  *     with `-vcodec ppm`, i.e. a real uncompressed video interchange form.
  *
  * Every entry point is TOTAL: malformed or truncated payloads return None
  * rather than throwing, so a poison blob can't kill a partition task (same
  * rule as the ingest plane's drop-bad-rows contract).
  *
  * The resample is nearest-neighbor with the floor mapping
  * `src = (dst * srcDim) div dstDim` — chosen because it is exactly
  * specifiable in integer arithmetic, so tests can assert output pixels
  * byte-for-byte (the repo-wide cross-engine determinism rule applied to
  * pixels).
  */
object ImageCodec {

  /** Decoded raster: row-major RGB, 3 bytes per pixel, top-down. */
  final case class Raster(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3, "raster byte count mismatch")
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val o = (y * width + x) * 3
      ((rgb(o) & 0xff), (rgb(o + 1) & 0xff), (rgb(o + 2) & 0xff))
    }
  }

  /** Best-effort format sniff from magic bytes (cheap; full validation
    * happens in the decoder).
    */
  def looksLikePpm(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'P' && b(1) == '6'

  def looksLikeBmp(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  /** Decode a single image payload of any supported still format. */
  def decodeImage(b: Array[Byte]): Option[Raster] =
    if (looksLikePpm(b)) decodePpmAt(b, 0).map(_._1)
    else if (looksLikeBmp(b)) decodeBmp(b)
    else None

  // -------------------------------------------------------------------- PPM

  /** One `P6` image starting at `off`; returns the raster and the offset of
    * the first byte after it (stream support). Header grammar per netpbm:
    * "P6", then whitespace-separated width/height/maxval with `#` comments
    * allowed anywhere in the header, then EXACTLY ONE whitespace byte, then
    * `width*height*3` binary samples. Only 1-byte samples (maxval <= 255)
    * are supported — 2-byte-sample PPMs are rejected, not misread.
    */
  private def decodePpmAt(b: Array[Byte], off: Int): Option[(Raster, Int)] = {
    var i = off
    def eof = i >= b.length
    def skipWsAndComments(): Unit = {
      var going = true
      while (going && !eof) {
        val c = b(i)
        if (c == '#') { while (!eof && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else going = false
      }
    }
    def token(): Option[String] = {
      skipWsAndComments()
      val s = i
      while (!eof && !" \t\r\n#".contains(b(i).toChar)) i += 1
      if (i > s) Some(new String(b, s, i - s, "US-ASCII")) else None
    }
    try {
      if (!(b.length >= off + 2 && b(off) == 'P' && b(off + 1) == '6')) return None
      i = off + 2
      val hdr = for {
        w <- token().flatMap(_.toIntOption)
        h <- token().flatMap(_.toIntOption)
        m <- token().flatMap(_.toIntOption)
      } yield (w, h, m)
      hdr match {
        case Some((w, h, m)) if w > 0 && h > 0 && m > 0 && m <= 255 =>
          i += 1 // the single post-maxval whitespace byte
          val need = w * h * 3
          if (i + need > b.length) None
          else {
            val out = java.util.Arrays.copyOfRange(b, i, i + need)
            Some((Raster(w, h, out), i + need))
          }
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** All frames of a PPM stream (>= 1 back-to-back `P6` images). Returns
    * None unless the payload is fully consumed by whole frames — a truncated
    * tail means a corrupt payload, not a shorter video.
    */
  def decodePpmStream(b: Array[Byte]): Option[Vector[Raster]] = {
    var frames = Vector.empty[Raster]
    var off = 0
    while (off < b.length) {
      decodePpmAt(b, off) match {
        case Some((r, next)) => frames :+= r; off = next
        case None => return None
      }
    }
    if (frames.nonEmpty) Some(frames) else None
  }

  def encodePpm(r: Raster): Array[Byte] = {
    val hdr = s"P6\n${r.width} ${r.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + r.rgb.length)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    System.arraycopy(r.rgb, 0, out, hdr.length, r.rgb.length)
    out
  }

  // -------------------------------------------------------------------- BMP

  private def i32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** 24-bit uncompressed BI_RGB only (the uncompressed interchange case);
    * positive biHeight = bottom-up rows (the common layout), negative =
    * top-down. Rows are BGR, padded to 4-byte multiples.
    */
  def decodeBmp(b: Array[Byte]): Option[Raster] = {
    try {
      if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
      val dataOff = i32le(b, 10)
      val hdrSize = i32le(b, 14)
      if (hdrSize < 40) return None // BITMAPCOREHEADER etc. unsupported
      val w = i32le(b, 18)
      val rawH = i32le(b, 22)
      val bpp = u16le(b, 28)
      val compression = i32le(b, 30)
      if (w <= 0 || rawH == 0 || bpp != 24 || compression != 0) return None
      val topDown = rawH < 0
      val h = math.abs(rawH)
      val rowSize = ((24 * w + 31) / 32) * 4
      if (dataOff < 0 || dataOff.toLong + rowSize.toLong * h > b.length) return None
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y
        val ro = dataOff + srcRow * rowSize
        var x = 0
        while (x < w) {
          val so = ro + x * 3
          val do_ = (y * w + x) * 3
          out(do_) = b(so + 2)     // R
          out(do_ + 1) = b(so + 1) // G
          out(do_ + 2) = b(so)     // B
          x += 1
        }
        y += 1
      }
      Some(Raster(w, h, out))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // --------------------------------------------------------------- resample

  /** Nearest-neighbor resample with the exact floor mapping
    * `src = (dst * srcDim) div dstDim`. Pure integer arithmetic —
    * bit-identical everywhere.
    */
  def resizeNearest(r: Raster, outW: Int, outH: Int): Raster = {
    require(outW > 0 && outH > 0, s"bad target ${outW}x$outH")
    if (outW == r.width && outH == r.height) r
    else {
      val out = new Array[Byte](outW * outH * 3)
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * r.height / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = (x.toLong * r.width / outW).toInt
          val so = (sy * r.width + sx) * 3
          val dst = (y * outW + x) * 3
          out(dst) = r.rgb(so); out(dst + 1) = r.rgb(so + 1); out(dst + 2) = r.rgb(so + 2)
          x += 1
        }
        y += 1
      }
      Raster(outW, outH, out)
    }
  }
}
