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
    // Long arithmetic: a crafted header like `P6 1431655766 1` must not be
    // able to overflow the product into a passing check.
    require(rgb.length.toLong == width.toLong * height * 3,
      "raster byte count mismatch")
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

  def looksLikePng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a

  def looksLikeJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  /** Decode a single image payload of any supported still format. */
  def decodeImage(b: Array[Byte]): Option[Raster] =
    if (looksLikePpm(b)) decodePpmAt(b, 0).map(_._1)
    else if (looksLikeBmp(b)) decodeBmp(b)
    else if (looksLikePng(b)) decodePng(b)
    else if (looksLikeGif(b)) decodeGif(b)
    else if (looksLikeJpeg(b)) JpegCodec.decode(b)
    else if (TiffCodec.looksLikeTiff(b)) TiffCodec.decodeTiff(b)
    else if (QoiCodec.looksLikeQoi(b)) QoiCodec.decodeQoi(b)
    // ICO last: its 00 00 01 00 magic is the weakest of the family
    else if (IcoCodec.looksLikeIco(b)) IcoCodec.decodeIco(b).map(_.head)
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
          // Validate the sample count in Long BEFORE any Int-sized use: a
          // crafted header (e.g. `P6 1431655766 1 255`) overflows w*h*3 in
          // Int to a tiny positive value, which would pass the bounds check
          // and build a bogus Raster that later dies in pixel math —
          // breaking the totality contract.
          val needL = w.toLong * h * 3
          if (needL > b.length - i) None
          else {
            val need = needL.toInt
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

  /** Uncompressed BI_RGB at 24-bit BGR, 32-bit BGRA (alpha dropped, like
    * the PNG contract), or 8-bit paletted (BGRA color table); positive
    * biHeight = bottom-up rows (the common layout), negative = top-down.
    * Rows are padded to 4-byte multiples. RLE and bitfield compressions
    * are rejected, not misread.
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
      if (w <= 0 || rawH == 0 || (bpp != 24 && bpp != 32 && bpp != 8)) return None
      // compression 1 = BI_RLE8 (8bpp, bottom-up only per spec)
      if (compression != 0 && !(compression == 1 && bpp == 8 && rawH > 0)) return None
      val topDown = rawH < 0
      if (rawH == Int.MinValue) return None // abs would stay negative
      val h = math.abs(rawH)
      // palette (8bpp): BGRA entries right after the info header;
      // biClrUsed = 0 means the full 256
      var palette: Array[Byte] = null
      if (bpp == 8) {
        val used0 = i32le(b, 46)
        val used = if (used0 == 0) 256 else used0
        if (used < 0 || used > 256) return None
        val po = 14 + hdrSize
        if (po.toLong + 4L * used > b.length) return None
        palette = new Array[Byte](used * 3)
        var i = 0
        while (i < used) {
          palette(i * 3) = b(po + i * 4 + 2)     // R
          palette(i * 3 + 1) = b(po + i * 4 + 1) // G
          palette(i * 3 + 2) = b(po + i * 4)     // B
          i += 1
        }
      }
      if (w.toLong * h * 3 > Int.MaxValue) return None
      // BI_RLE8: decode the run stream into a FILE-row-order index plane
      // first (row 0 = bottom); escapes: 0,0 = end-of-line, 0,1 =
      // end-of-bitmap, 0,2 = delta (skipped pixels stay index 0 — the
      // spec leaves them undefined, 0 is the convention), 0,k>=3 =
      // absolute run padded to a word boundary. Runs never cross rows.
      var rleIdx: Array[Byte] = null
      if (compression == 1) {
        rleIdx = new Array[Byte](w * h)
        var i = dataOff
        var x = 0; var r = 0
        var done = false
        while (!done) {
          if (i + 2 > b.length) return None
          val n = b(i) & 0xff; val v = b(i + 1) & 0xff
          i += 2
          if (n > 0) {
            if (r >= h || x + n > w) return None
            var k = 0
            while (k < n) { rleIdx(r * w + x) = v.toByte; x += 1; k += 1 }
          } else v match {
            case 0 => x = 0; r += 1; if (r > h) return None
            case 1 => done = true
            case 2 =>
              if (i + 2 > b.length) return None
              x += b(i) & 0xff; r += b(i + 1) & 0xff
              i += 2
              if (x > w || r > h) return None
            case k =>
              if (r >= h || x + k > w) return None
              if (i + k + (k & 1) > b.length) return None
              var j = 0
              while (j < k) { rleIdx(r * w + x) = b(i + j); x += 1; j += 1 }
              i += k + (k & 1)
          }
        }
      }
      // Row stride in Long: bpp*w overflows Int at large w, which would
      // corrupt the bounds check below. Once rowSizeL*h fits in b.length,
      // w*h*3 <= rowSizeL*h*3 necessarily fits in Int for bpp >= 8.
      val rowSizeL = ((bpp.toLong * w + 31) / 32) * 4
      if (compression == 0 &&
        (dataOff < 0 || dataOff.toLong + rowSizeL * h > b.length)) return None
      val rowSize = rowSizeL.toInt
      val out = new Array[Byte](w * h * 3)
      val step = bpp / 8
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y
        val ro = dataOff + srcRow * rowSize
        var x = 0
        while (x < w) {
          val do_ = (y * w + x) * 3
          if (bpp == 8) {
            val raw =
              if (compression == 1) rleIdx(srcRow * w + x) & 0xff
              else b(ro + x) & 0xff
            val idx = raw * 3
            if (idx + 2 >= palette.length) return None
            out(do_) = palette(idx)
            out(do_ + 1) = palette(idx + 1)
            out(do_ + 2) = palette(idx + 2)
          } else { // 24/32: BGR(A), alpha byte ignored
            val so = ro + x * step
            out(do_) = b(so + 2)     // R
            out(do_ + 1) = b(so + 1) // G
            out(do_ + 2) = b(so)     // B
          }
          x += 1
        }
        y += 1
      }
      Some(Raster(w, h, out))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** 64-bit perceptual average-hash — the image near-dup signal (a
    * re-encoded/resized copy keeps a close hash while content-fp exact
    * dedup misses it). All INTEGER: pixels land on an 8×8 block grid by
    * `(x*8)/w` floor division, a bit is set iff its block's luma mean
    * exceeds the global mean, compared CROSS-MULTIPLIED
    * (blockSum·w·h > totalSum·blockN) so no division ever rounds —
    * bit-identical across engines and hash-comparable in the
    * `image_ahash` oracle row. Hamming distance over these is the
    * banding key for perceptual dedup, same pigeonhole scheme as
    * dedup_simhash_near.
    */
  def aHash64(r: Raster): Long = {
    val w = r.width; val h = r.height
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        val g = (r.rgb(p) & 0xff) + (r.rgb(p + 1) & 0xff) + (r.rgb(p + 2) & 0xff)
        val b = (y * 8 / h) * 8 + (x * 8 / w)
        sums(b) += g; cnts(b) += 1; total += g
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (cnts(b) > 0 && sums(b) * w * h > total * cnts(b)) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** Difference hash (dHash, the gradient twin of [[aHash64]]): the
    * raster folds onto a floor-grid of 8 rows × 9 columns of block
    * means, and bit (yb·8 + xb) is set iff the column to the RIGHT is
    * strictly brighter — the horizontal-gradient signature that survives
    * brightness/contrast shifts aHash's global-mean comparison doesn't.
    * Mean comparison is cross-multiplied (s_right·n_left > s_left·n_right,
    * exact integers, no division); a bit whose left or right cell is
    * EMPTY (possible only at width 8, where the 9-column grid leaves one
    * column unpopulated) stays 0 — mirrored by the oracle's inner join.
    */
  def dHash64(r: Raster): Long = {
    val w = r.width; val h = r.height
    val sums = new Array[Long](72) // 8 rows x 9 cols
    val cnts = new Array[Long](72)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        val g = (r.rgb(p) & 0xff) + (r.rgb(p + 1) & 0xff) + (r.rgb(p + 2) & 0xff)
        val c = (y * 8 / h) * 9 + (x * 9 / w)
        sums(c) += g; cnts(c) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var yb = 0
    while (yb < 8) {
      var xb = 0
      while (xb < 8) {
        val l = yb * 9 + xb
        if (cnts(l) > 0 && cnts(l + 1) > 0
            && sums(l + 1) * cnts(l) > sums(l) * cnts(l + 1))
          hash |= 1L << (yb * 8 + xb)
        xb += 1
      }
      yb += 1
    }
    hash
  }

  /** Hand-packable BI_RLE8 BMP: 54-byte headers + a BGRA palette of
    * `pal` rgb triples + the caller's raw RLE stream (runs, escapes, and
    * the final 0,1 end-of-bitmap included). Fixture builder for the RLE
    * path of [[decodeBmp]] (specs and the `bmp_meta` oracle row) — there
    * is deliberately no RLE compressor; the stream IS the test vector.
    */
  def bmpRle8Container(w: Int, h: Int, pal: Array[Byte], rle: Array[Byte]): Array[Byte] = {
    require(pal.length % 3 == 0 && pal.length > 0, "pal must be rgb triples")
    val used = pal.length / 3
    val dataOff = 54 + 4 * used
    val buf = java.nio.ByteBuffer.allocate(dataOff + rle.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(dataOff + rle.length)
      .putShort(0).putShort(0).putInt(dataOff)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(8)
      .putInt(1) // biCompression = BI_RLE8
      .putInt(rle.length).putInt(0).putInt(0).putInt(used).putInt(0)
    var i = 0
    while (i < used) { // BGRA entries
      buf.put(pal(i * 3 + 2)).put(pal(i * 3 + 1)).put(pal(i * 3)).put(0.toByte)
      i += 1
    }
    buf.put(rle)
    buf.array()
  }

  // -------------------------------------------------------------------- PNG

  private def i32be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** PNG (RFC 2083), decoded with nothing but `java.util.zip` — the one
    * compressed format reachable pure-JVM, and the dominant lossless format
    * in real media corpora. Supported: EVERY legal (color type, bit depth)
    * combination — gray 1/2/4/8/16, palette 1/2/4/8, RGB / gray+alpha /
    * RGBA 8/16 — under BOTH interlace methods (none and Adam7: seven
    * independently-filtered sub-images scattered on the pass grids); all
    * five scanline filter types (None/Sub/Up/Average/Paeth).
    * Depth normalization: 16-bit samples keep their high byte
    * (the standard 16→8 down-conversion); sub-8-bit GRAY samples scale by
    * 255/(2^d −1) (so 1-bit white is 255, not 1); sub-8-bit PALETTE
    * indexes are used raw, never scaled. Alpha is DROPPED, not
    * composited — this kernel feeds pixel statistics and thumbnailing, not
    * display. CRCs are verified on the chunks whose corruption would
    * corrupt pixels (IHDR/PLTE/IDAT); ancillary chunks are skipped without
    * CRC cost. Same totality contract as the other decoders: any
    * malformed, truncated, or overflow-crafted payload returns None, never
    * throws.
    */
  def decodePng(b: Array[Byte]): Option[Raster] = {
    val inf = new java.util.zip.Inflater()
    try {
      if (!looksLikePng(b)) return None
      var i = 8
      var w = 0; var h = 0
      var bitDepth = -1; var colorType = -1; var interlace = -1
      var palette: Array[Byte] = null
      var seenIhdr = false; var seenIend = false
      val idat = new java.io.ByteArrayOutputStream()
      val crc = new java.util.zip.CRC32()
      while (!seenIend) {
        if (i + 8 > b.length) return None
        val len = i32be(b, i)
        if (len < 0 || i.toLong + 12 + len > b.length) return None
        val typ = new String(b, i + 4, 4, "US-ASCII")
        def crcOk: Boolean = {
          crc.reset(); crc.update(b, i + 4, 4 + len)
          crc.getValue.toInt == i32be(b, i + 8 + len)
        }
        typ match {
          case "IHDR" =>
            if (seenIhdr || len != 13 || !crcOk) return None
            seenIhdr = true
            w = i32be(b, i + 8); h = i32be(b, i + 12)
            bitDepth = b(i + 16) & 0xff; colorType = b(i + 17) & 0xff
            interlace = b(i + 20) & 0xff
            // supported subset, with Long-checked output sizes: the raw
            // filtered buffer h*(1+strideBytes), the 8-bit sample plane
            // h*w*ch, and the RGB output w*h*3 must all fit Int
            val ch = channelsOf(colorType)
            val sbL = (w.toLong * ch * bitDepth + 7) / 8
            // interlace 1 = Adam7; its raw size (per-pass filter bytes +
            // per-pass row rounding) is bounded and re-checked exactly at
            // the pass-geometry step below
            if (w <= 0 || h <= 0 || ch == 0 || !depthOk(colorType, bitDepth) ||
              (interlace != 0 && interlace != 1) ||
              h.toLong * (1L + sbL) > Int.MaxValue ||
              w.toLong * h * ch > Int.MaxValue ||
              w.toLong * h * 3 > Int.MaxValue) return None
          case "PLTE" =>
            if (!seenIhdr || len % 3 != 0 || len > 768 || !crcOk) return None
            palette = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
          case "IDAT" =>
            if (!seenIhdr || !crcOk) return None
            idat.write(b, i + 8, len)
          case "IEND" => seenIend = true
          case _ => () // ancillary — skip
        }
        i += 12 + len
      }
      if (!seenIhdr) return None
      val ch = channelsOf(colorType)
      if (colorType == 3 && palette == null) return None
      // pass geometry: non-interlaced is the single pass (0,0,1,1); Adam7
      // is seven sub-images, each independently filtered, concatenated in
      // one zlib stream. Empty passes (small images) contribute NO
      // scanlines at all, per spec.
      val passes =
        if (interlace == 0) Seq((0, 0, 1, 1))
        else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      // (x0, y0, dx, dy, wp, hp, strideBytes) per non-empty pass
      val geo = passes.map { case (x0, y0, dx, dy) =>
        val wp = if (w > x0) (w - x0 + dx - 1) / dx else 0
        val hp = if (h > y0) (h - y0 + dy - 1) / dy else 0
        (x0, y0, dx, dy, wp, hp, ((wp.toLong * ch * bitDepth + 7) / 8).toInt)
      }.filter(g => g._5 > 0 && g._6 > 0)
      // filters operate on BYTES with a step of bpp = the byte width of
      // one pixel (min 1 for sub-byte depths, per the PNG spec)
      val bpp = math.max(1, ch * bitDepth / 8)
      val rawLenL = geo.map { case (_, _, _, _, _, hp, sb) => hp.toLong * (sb + 1) }.sum
      if (rawLenL > Int.MaxValue) return None
      val rawLen = rawLenL.toInt
      val raw = new Array[Byte](rawLen)
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, got, rawLen - got)
        // truncated zlib stream, or a preset-dictionary stream (illegal in
        // PNG) — either way the pixels can't be recovered
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        got += n
      }
      if (got != rawLen) return None
      // per pass: un-filter, depth-normalize, scatter into the full-size
      // 8-bit sample plane (every output pixel is written exactly once
      // across passes, so there is no compositing order to get wrong)
      val stride = w * ch
      val px = new Array[Byte](h * stride)
      val maxV = (1 << bitDepth) - 1
      var rawOff = 0
      for ((x0, y0, dx, dy, wp, hp, strideBytes) <- geo) {
        val rec = new Array[Byte](hp * strideBytes)
        var y = 0
        while (y < hp) {
          val ft = raw(rawOff + y * (strideBytes + 1)) & 0xff
          if (ft > 4) return None
          val ro = rawOff + y * (strideBytes + 1) + 1
          val po = y * strideBytes
          var x = 0
          while (x < strideBytes) {
            val cur = raw(ro + x) & 0xff
            val a = if (x >= bpp) rec(po + x - bpp) & 0xff else 0           // left
            val bb = if (y > 0) rec(po - strideBytes + x) & 0xff else 0     // up
            val c = if (y > 0 && x >= bpp) rec(po - strideBytes + x - bpp) & 0xff else 0
            val recon = ft match {
              case 0 => cur
              case 1 => cur + a
              case 2 => cur + bb
              case 3 => cur + (a + bb) / 2
              case 4 => // Paeth
                val p = a + bb - c
                val pa = math.abs(p - a); val pb = math.abs(p - bb)
                val pc = math.abs(p - c)
                cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c)
            }
            rec(po + x) = (recon & 0xff).toByte
            x += 1
          }
          y += 1
        }
        rawOff += hp * (strideBytes + 1)
        // depth-normalize this pass's samples and scatter to (x0+i·dx,
        // y0+j·dy): 16-bit keeps the high byte, sub-8 gray scales to the
        // full range, palette indexes stay raw
        var j = 0
        while (j < hp) {
          var i2 = 0
          while (i2 < wp) {
            val dst = ((y0 + j * dy) * w + (x0 + i2 * dx)) * ch
            var c2 = 0
            while (c2 < ch) {
              val v = bitDepth match {
                case 8 => rec(j * strideBytes + i2 * ch + c2) & 0xff
                case 16 => rec(j * strideBytes + (i2 * ch + c2) * 2) & 0xff
                case d => // 1/2/4-bit: MSB-first packed, single-channel
                  val bitPos = i2 * d
                  val b0 = rec(j * strideBytes + (bitPos >> 3)) & 0xff
                  val raw0 = (b0 >> (8 - d - (bitPos & 7))) & maxV
                  if (colorType == 0) raw0 * 255 / maxV else raw0
              }
              px(dst + c2) = v.toByte
              c2 += 1
            }
            i2 += 1
          }
          j += 1
        }
      }
      // expand to packed RGB
      val out = new Array[Byte](w * h * 3)
      val nPx = w * h
      var p = 0
      while (p < nPx) {
        val s = p * ch; val d = p * 3
        colorType match {
          case 2 | 6 => // RGB / RGBA (alpha dropped)
            out(d) = px(s); out(d + 1) = px(s + 1); out(d + 2) = px(s + 2)
          case 0 | 4 => // gray / gray+alpha
            out(d) = px(s); out(d + 1) = px(s); out(d + 2) = px(s)
          case 3 => // palette index
            val idx = (px(s) & 0xff) * 3
            if (idx + 2 >= palette.length) return None
            out(d) = palette(idx); out(d + 1) = palette(idx + 1)
            out(d + 2) = palette(idx + 2)
        }
        p += 1
      }
      Some(Raster(w, h, out))
    } catch { case scala.util.control.NonFatal(_) => None }
    finally inf.end()
  }

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    case _ => 0
  }

  /** Legal (color type, bit depth) pairs per the PNG spec §11.2.2. */
  private def depthOk(colorType: Int, d: Int): Boolean = colorType match {
    case 0 => d == 1 || d == 2 || d == 4 || d == 8 || d == 16
    case 3 => d == 1 || d == 2 || d == 4 || d == 8
    case 2 | 4 | 6 => d == 8 || d == 16
    case _ => false
  }

  // -------------------------------------------------------------------- GIF

  def looksLikeGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** First frame of a GIF payload — [[decodeGifFrames]]' head. */
  def decodeGif(b: Array[Byte]): Option[Raster] = decodeGifFrames(b).map(_.head)

  /** GIF87a/89a, EVERY frame, via a full variable-width LZW decoder — the
    * third compressed web format next to PNG (the LZW here and the
    * DEFLATE there cover the two compression families lossless web images
    * actually use), and — multi-frame — the second VIDEO container next
    * to the PPM stream: each frame composites onto the logical-screen
    * canvas (draw at its (left, top) rect; transparency from the 89a
    * graphic-control extension leaves the underlying canvas; disposal 0/1
    * keep the canvas, 2 restores the frame rect to the background color,
    * 3 restores the canvas to its pre-frame state via a one-frame saved
    * snapshot) and every returned raster is the full screen-sized canvas
    * snapshot, the animation semantics players implement. Supported:
    * global or local color tables per frame and INTERLACED frames (the
    * four-pass row order: rows 0 mod 8, 4 mod 8, 2 mod 4, 1 mod 2 — the
    * LZW stream is identical, only the destination row of each strip
    * changes). Same totality contract as every decoder here: malformed,
    * truncated, or overflow-crafted payloads return None.
    */
  def decodeGifFrames(b: Array[Byte]): Option[Vector[Raster]] = {
    try {
      if (!looksLikeGif(b)) return None
      var i = 6
      def u8(o: Int): Int = b(o) & 0xff
      def u16(o: Int): Int = u8(o) | (u8(o + 1) << 8)
      if (i + 7 > b.length) return None
      val sw = u16(i); val sh = u16(i + 2)
      val gctFlag = (u8(i + 4) & 0x80) != 0
      val gctSize = 2 << (u8(i + 4) & 7)
      val bgIndex = u8(i + 5)
      i += 7
      var gct: Array[Byte] = null
      if (gctFlag) {
        if (i + gctSize * 3 > b.length) return None
        gct = java.util.Arrays.copyOfRange(b, i, i + gctSize * 3)
        i += gctSize * 3
      }
      if (sw <= 0 || sh <= 0 || sw.toLong * sh * 3 > Int.MaxValue) return None
      // canvas starts as the background color (black without a GCT)
      val bgR = if (gct != null && bgIndex * 3 + 2 < gct.length) gct(bgIndex * 3) else 0.toByte
      val bgG = if (gct != null && bgIndex * 3 + 2 < gct.length) gct(bgIndex * 3 + 1) else 0.toByte
      val bgB = if (gct != null && bgIndex * 3 + 2 < gct.length) gct(bgIndex * 3 + 2) else 0.toByte
      val canvas = new Array[Byte](sw * sh * 3)
      def fillRect(x0: Int, y0: Int, w: Int, h: Int): Unit = {
        var y = y0
        while (y < y0 + h) {
          var x = x0
          while (x < x0 + w) {
            val d = (y * sw + x) * 3
            canvas(d) = bgR; canvas(d + 1) = bgG; canvas(d + 2) = bgB
            x += 1
          }
          y += 1
        }
      }
      fillRect(0, 0, sw, sh)
      var frames = Vector.empty[Raster]
      var transIdx = -1 // pending graphic-control state for the NEXT frame
      var disposal = 0
      while (true) {
        if (i >= b.length) return None
        u8(i) match {
          case 0x3b => // trailer
            return if (frames.nonEmpty) Some(frames) else None
          case 0x21 if i + 1 < b.length && u8(i + 1) == 0xf9 => // GCE
            if (i + 8 > b.length || u8(i + 2) != 4) return None
            val flags = u8(i + 3)
            disposal = (flags >> 2) & 7
            if (disposal > 3) return None // 4..7 are undefined: reject, don't misrender
            transIdx = if ((flags & 1) != 0) u8(i + 6) else -1
            if (u8(i + 7) != 0) return None // sub-block terminator
            i += 8
          case 0x21 => // other extension: label + sub-blocks, skip
            i += 2
            while (i < b.length && u8(i) != 0) i += 1 + u8(i)
            if (i >= b.length) return None
            i += 1 // block terminator
          case 0x2c => // image descriptor
            if (i + 10 > b.length) return None
            val left = u16(i + 1); val top = u16(i + 3)
            val w = u16(i + 5); val h = u16(i + 7)
            val flags = u8(i + 9)
            i += 10
            if (w <= 0 || h <= 0 || left + w > sw || top + h > sh) return None
            val interlaced = (flags & 0x40) != 0
            var table = gct
            if ((flags & 0x80) != 0) { // local color table wins
              val sz = 2 << (flags & 7)
              if (i + sz * 3 > b.length) return None
              table = java.util.Arrays.copyOfRange(b, i, i + sz * 3)
              i += sz * 3
            }
            if (table == null) return None
            // disposal 3 (restore-to-previous): the canvas stack is bounded
            // to ONE saved frame — snapshot before drawing, restore after
            val saved = if (disposal == 3) canvas.clone() else null
            if (i >= b.length) return None
            val minCode = u8(i); i += 1
            if (minCode < 2 || minCode > 8) return None
            // concatenate sub-blocks into the LZW stream
            val data = new java.io.ByteArrayOutputStream()
            var bs = u8(i)
            while (bs != 0) {
              if (i + 1 + bs > b.length) return None
              data.write(b, i + 1, bs)
              i += 1 + bs
              if (i >= b.length) return None
              bs = u8(i)
            }
            i += 1 // consume the 0x00 block terminator
            val indices = lzwDecode(data.toByteArray, minCode, w * h)
              .getOrElse(return None)
            // interlace: strip p of the stream lands on row rowOrder(p)
            val rowOrder: Int => Int =
              if (!interlaced) identity
              else {
                val order = new Array[Int](h)
                var r = 0
                for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                    y <- start until h by step) { order(r) = y; r += 1 }
                (p: Int) => order(p)
              }
            val nColors = table.length / 3
            var sy = 0
            while (sy < h) {
              val dy = top + rowOrder(sy)
              var x = 0
              while (x < w) {
                val idx = indices(sy * w + x) & 0xff
                if (idx != transIdx) { // transparent pixels keep the canvas
                  // some encoders use transparent index == table size; only
                  // bounds-check indexes that will actually be drawn
                  if (idx >= nColors) return None
                  val d = (dy * sw + left + x) * 3
                  canvas(d) = table(idx * 3)
                  canvas(d + 1) = table(idx * 3 + 1)
                  canvas(d + 2) = table(idx * 3 + 2)
                }
                x += 1
              }
              sy += 1
            }
            frames :+= Raster(sw, sh, canvas.clone()) // full-canvas snapshot
            if (disposal == 2) fillRect(left, top, w, h)
            else if (saved != null) System.arraycopy(saved, 0, canvas, 0, canvas.length)
            transIdx = -1
            disposal = 0
          case _ => return None
        }
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** GIF-flavor LZW: variable code width from `minCode`+1 up to 12 bits,
    * CLEAR resets the table, EOI ends the stream; codes pack LSB-first.
    * Returns exactly `expected` pixel indices or None.
    */
  private def lzwDecode(d: Array[Byte], minCode: Int, expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outN = 0
    // dictionary: prefix link + appended byte; entries < clear are literals
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var next = eoi + 1
    var width = minCode + 1
    var bitPos = 0
    val totalBits = d.length * 8
    var prev = -1
    def emit(code: Int): Boolean = { // writes the expansion of `code`
      var stack = List.empty[Byte]
      var c = code
      while (c >= clear) { stack = append(c) :: stack; c = prefix(c) }
      stack = c.toByte :: stack
      for (byte <- stack) {
        if (outN >= expected) return false
        out(outN) = byte; outN += 1
      }
      true
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    while (bitPos + width <= totalBits) {
      // LSB-first read of `width` bits at bitPos
      var code = 0
      var k = 0
      while (k < width) {
        val bp = bitPos + k
        if ((d(bp >> 3) & (1 << (bp & 7))) != 0) code |= 1 << k
        k += 1
      }
      bitPos += width
      if (code == eoi) return if (outN == expected) Some(out) else None
      else if (code == clear) {
        next = eoi + 1; width = minCode + 1; prev = -1
      } else {
        if (code > next || (code == next && prev == -1)) return None
        if (prev == -1) {
          if (code >= clear) return None
          if (!emit(code)) return None
        } else {
          if (code == next) { // the KwKwK case
            if (next >= 4096) return None
            prefix(next) = prev; append(next) = firstByte(prev); next += 1
            if (!emit(code)) return None
          } else {
            if (!emit(code)) return None
            if (next < 4096) {
              prefix(next) = prev; append(next) = firstByte(code); next += 1
            }
          }
        }
        prev = code
        // width grows when the NEXT code could not fit (GIF rule: at
        // next == 2^width, not after)
        if (next == (1 << width) && width < 12) width += 1
      }
    }
    None // ran out of bits before EOI
  }

  /** Minimal single-frame GIF87a encode — [[encodeGifAnimated]] of one. */
  def encodeGif(r: Raster): Option[Array[Byte]] = encodeGifAnimated(Seq(r))

  /** Minimal multi-frame GIF87a encoder (global color table built from the
    * UNION of the frames' distinct colors — at most 256, callers quantize
    * beforehand; per frame one full-canvas image descriptor whose LZW
    * stream is literal codes with a CLEAR before the table would
    * overflow) — exists so specs and the media generator can produce REAL
    * animated-GIF payloads that exercise the full multi-frame LZW decode
    * + compositing path. All frames must share one size.
    */
  def encodeGifAnimated(framesIn: Seq[Raster]): Option[Array[Byte]] = {
    if (framesIn.isEmpty) return None
    val fw = framesIn.head.width; val fh = framesIn.head.height
    if (!framesIn.forall(f => f.width == fw && f.height == fh)) return None
    val colors = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    for (r <- framesIn) {
      val nPx = fw * fh
      var p = 0
      while (p < nPx) {
        val c = ((r.rgb(p * 3) & 0xff) << 16) | ((r.rgb(p * 3 + 1) & 0xff) << 8) |
          (r.rgb(p * 3 + 2) & 0xff)
        if (!colors.contains(c)) {
          if (colors.size == 256) return None // caller must quantize first
          colors(c) = colors.size
        }
        p += 1
      }
    }
    // color-table size: power of two >= max(2, nColors); minCode >= 2
    var bits = 2
    while ((1 << bits) < colors.size) bits += 1
    val tblSize = 1 << bits
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(fw); w16(fh)
    out.write(0x80 | (bits - 1)); out.write(0); out.write(0) // GCT flag+size
    for ((c, _) <- colors) { out.write(c >> 16); out.write((c >> 8) & 0xff); out.write(c & 0xff) }
    for (_ <- colors.size until tblSize) { out.write(0); out.write(0); out.write(0) }
    for (r <- framesIn) {
      val nPx = fw * fh
      val idx = new Array[Byte](nPx)
      var p = 0
      while (p < nPx) {
        val c = ((r.rgb(p * 3) & 0xff) << 16) | ((r.rgb(p * 3 + 1) & 0xff) << 8) |
          (r.rgb(p * 3 + 2) & 0xff)
        idx(p) = colors(c).toByte
        p += 1
      }
      val block = gifFrameBlock(0, 0, fw, fh, idx, bits)
      out.write(block, 0, block.length)
    }
    out.write(0x3b) // trailer
    Some(out.toByteArray)
  }

  /** Literal-code GIF LZW stream: CLEAR, then every index as a literal,
    * re-CLEARing before the decoder's code width would grow past
    * minCode+1; codes pack LSB-first. Valid input for any conformant
    * decoder (the dictionary is built but never referenced).
    */
  private def lzwLiteralStream(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode; val eoi = clear + 1
    val bitBuf = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    def putCode(c: Int): Unit = {
      acc |= c.toLong << accBits; accBits += minCode + 1
      while (accBits >= 8) { bitBuf.write((acc & 0xff).toInt); acc >>= 8; accBits -= 8 }
    }
    putCode(clear)
    var budget = (1 << (minCode + 1)) - eoi - 2 // codes until width would grow
    var p = 0
    while (p < indices.length) {
      if (budget == 0) { putCode(clear); budget = (1 << (minCode + 1)) - eoi - 2 }
      putCode(indices(p) & 0xff); budget -= 1
      p += 1
    }
    putCode(eoi)
    if (accBits > 0) bitBuf.write((acc & 0xff).toInt)
    bitBuf.toByteArray
  }

  /** One hand-packable GIF data block: an optional 89a graphic-control
    * extension (transparent index, disposal method) followed by an image
    * descriptor at (left, top) whose LZW stream encodes `indices` as
    * literal codes ([[lzwLiteralStream]]). `indices` is always CANVAS
    * row order; `interlaced` sets the descriptor flag and emits the rows
    * in the four-pass stream order, so the decoder must un-permute.
    * Building block for sub-rect / transparency / disposal / interlace
    * fixtures (specs and the `gif_meta` oracle row) that the full-canvas
    * [[encodeGifAnimated]] cannot express.
    */
  def gifFrameBlock(left: Int, top: Int, w: Int, h: Int, indices: Array[Byte],
                    minCode: Int, transIdx: Int = -1, disposal: Int = 0,
                    interlaced: Boolean = false): Array[Byte] = {
    require(indices.length == w * h, s"need $w*$h indices, got ${indices.length}")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    if (transIdx >= 0 || disposal > 0) { // graphic-control extension
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((disposal << 2) | (if (transIdx >= 0) 1 else 0))
      w16(0) // delay
      out.write(if (transIdx >= 0) transIdx else 0)
      out.write(0) // sub-block terminator
    }
    out.write(0x2c); w16(left); w16(top); w16(w); w16(h)
    out.write(if (interlaced) 0x40 else 0)
    out.write(minCode)
    val stream =
      if (!interlaced) indices
      else { // canvas rows scattered onto the four pass grids
        val s = new Array[Byte](indices.length)
        var r = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
             y <- start until h by step) {
          System.arraycopy(indices, y * w, s, r * w, w); r += 1
        }
        s
      }
    val lzw = lzwLiteralStream(stream, minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0) // block terminator
    out.toByteArray
  }

  /** GIF89a container around pre-built data blocks: screen descriptor +
    * global color table (rgb triples; padded to a power-of-two entry
    * count) + blocks + trailer. With [[gifFrameBlock]] this hand-packs
    * any compositing scenario the decoder supports.
    */
  def gifContainer(sw: Int, sh: Int, gct: Array[Byte], blocks: Seq[Array[Byte]]): Array[Byte] = {
    require(gct.length % 3 == 0 && gct.length > 0, "gct must be rgb triples")
    val nColors = gct.length / 3
    var bits = 1
    while ((1 << bits) < nColors) bits += 1
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(sw); w16(sh)
    out.write(0x80 | (bits - 1)); out.write(0); out.write(0) // GCT flag+size, bg=0
    out.write(gct, 0, gct.length)
    for (_ <- nColors until (1 << bits)) { out.write(0); out.write(0); out.write(0) }
    blocks.foreach(b => out.write(b, 0, b.length))
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Hand-packable PNG container: IHDR + optional PLTE + one IDAT (every
    * scanline filter 0) + IEND around raw canvas-order sample bytes
    * (`scan` excludes filter bytes; rows are byte-padded at the spec's
    * stride). With depths and color types [[encodePng]] never emits, this
    * is how the `png_depth_meta` oracle row reaches the gray-16 / sub-8 /
    * palette normalization paths through REAL deflated bytes.
    */
  def pngContainer(w: Int, h: Int, colorType: Int, bitDepth: Int,
                   scan: Array[Byte], palette: Array[Byte] = null): Array[Byte] = {
    val ch = channelsOf(colorType)
    val stride = ((w.toLong * ch * bitDepth + 7) / 8).toInt
    require(scan.length == stride * h, s"need $stride*$h scan bytes, got ${scan.length}")
    val raw = new Array[Byte](h * (stride + 1))
    var y = 0
    while (y < h) {
      // raw(y*(stride+1)) stays 0 = filter None
      System.arraycopy(scan, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw); def_.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!def_.finished()) zbuf.write(tmp, 0, def_.deflate(tmp))
    def_.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(bitDepth.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array())
    if (palette != null) chunk("PLTE", palette)
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Minimal PNG encoder (color type 2, filter 0 rows, one IDAT) — exists
    * so the media generator and specs can produce REAL compressed payloads
    * that exercise the inflate+unfilter path end-to-end.
    */
  def encodePng(r: Raster): Array[Byte] = {
    val stride = r.width * 3
    val raw = new Array[Byte](r.height * (stride + 1))
    var y = 0
    while (y < r.height) {
      // raw(y*(stride+1)) stays 0 = filter None
      System.arraycopy(r.rgb, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw); def_.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!def_.finished()) zbuf.write(tmp, 0, def_.deflate(tmp))
    def_.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val lenB = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(lenB)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(r.width).putInt(r.height)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    chunk("IHDR", ihdr)
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
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
