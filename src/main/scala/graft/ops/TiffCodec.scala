package graft.ops

/** Pure-JVM baseline TIFF codec — the tag-directory member of the codec
  * family next to [[ImageCodec]] (PPM/BMP/PNG/GIF) and [[JpegCodec]].
  * Decodes the baseline interchange set a scraped-corpus pipeline
  * actually meets for TIFF: 8-bit grayscale (both photometric polarities
  * — WhiteIsZero inverts) and 8-bit RGB, chunky planar layout, strips in
  * any count, uncompressed (tag 259 = 1), TIFF-flavor LZW (= 5, the
  * MSB-first early-change variant, optional horizontal-differencing
  * predictor tag 317 = 2) or PackBits (= 32773), BOTH byte orders ("II"
  * little / "MM" big endian). Everything else — tiled layout,
  * planar = 2, deflate/fax compressions, non-8-bit samples, palette
  * color — returns None, never a misrender.
  *
  * Same totality contract as the siblings: malformed, truncated, or
  * unsupported payloads return None, never throw — a poison blob
  * degrades, it doesn't kill the task.
  *
  * Layout reference: the public TIFF 6.0 specification (Adobe, 1992) —
  * 8-byte header (order mark, magic 42, IFD offset), 12-byte IFD
  * entries (tag, type, count, inlined-or-offset value), sample data in
  * strips of RowsPerStrip rows addressed by tags 273/279. PackBits is
  * the spec's Section 9 run-length scheme: control n in [0,127] copies
  * n+1 literals, n in [-127,-1] repeats the next byte 1-n times, -128
  * is a no-op.
  */
object TiffCodec {
  import ImageCodec.Raster

  def looksLikeTiff(b: Array[Byte]): Boolean =
    b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  /** One parsed IFD entry value list, widened to Long. */
  private final class Reader(b: Array[Byte], le: Boolean) {
    def u16(o: Int): Int =
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (u16(o) & 0xffffL) | ((u16(o + 2) & 0xffffL) << 16)
      else ((u16(o) & 0xffffL) << 16) | (u16(o + 2) & 0xffffL)
  }

  def decodeTiff(b: Array[Byte]): Option[Raster] = {
    try {
      if (!looksLikeTiff(b)) return None
      val le = b(0) == 'I'
      val rd = new Reader(b, le)
      val ifdOff = rd.u32(4)
      if (ifdOff < 8 || ifdOff + 2 > b.length) return None
      val nEntries = rd.u16(ifdOff.toInt)
      val base = ifdOff.toInt + 2
      if (base + nEntries * 12 > b.length) return None

      // read an entry's values (BYTE=1, SHORT=3, LONG=4 only)
      def values(eOff: Int): Option[Array[Long]] = {
        val typ = rd.u16(eOff + 2)
        val cnt = rd.u32(eOff + 4)
        if (cnt <= 0 || cnt > (1L << 20)) return None
        val sz = typ match {
          case 1 => 1
          case 3 => 2
          case 4 => 4
          case _ => return None
        }
        val total = sz * cnt
        val vOff = if (total <= 4) eOff + 8 else {
          val o = rd.u32(eOff + 8)
          if (o < 0 || o + total > b.length) return None
          o.toInt
        }
        if (vOff + total > b.length) return None
        Some(Array.tabulate(cnt.toInt) { i =>
          sz match {
            case 1 => (b(vOff + i) & 0xff).toLong
            case 2 => rd.u16(vOff + i * 2).toLong
            case 4 => rd.u32(vOff + i * 4)
          }
        })
      }

      var width = -1L; var height = -1L
      var bits: Array[Long] = Array(8L)
      var compression = 1L; var photometric = -1L
      var stripOffs: Array[Long] = null; var stripCnts: Array[Long] = null
      var spp = 1L; var rowsPerStrip = Long.MaxValue
      var planar = 1L; var sampleFormat = 1L; var predictor = 1L
      var e = 0
      while (e < nEntries) {
        val eOff = base + e * 12
        val tag = rd.u16(eOff)
        tag match {
          case 256 => width = values(eOff).flatMap(_.headOption).getOrElse(return None)
          case 257 => height = values(eOff).flatMap(_.headOption).getOrElse(return None)
          case 258 => bits = values(eOff).getOrElse(return None)
          case 259 => compression = values(eOff).flatMap(_.headOption).getOrElse(return None)
          case 262 => photometric = values(eOff).flatMap(_.headOption).getOrElse(return None)
          case 273 => stripOffs = values(eOff).getOrElse(return None)
          case 277 => spp = values(eOff).flatMap(_.headOption).getOrElse(return None)
          case 278 => rowsPerStrip = values(eOff).flatMap(_.headOption).getOrElse(return None)
          case 279 => stripCnts = values(eOff).getOrElse(return None)
          case 284 => planar = values(eOff).flatMap(_.headOption).getOrElse(return None)
          case 317 => predictor = values(eOff).flatMap(_.headOption).getOrElse(return None)
          case 339 => sampleFormat = values(eOff).flatMap(_.headOption).getOrElse(return None)
          case _ => () // orientation, resolution, software, ... — ignored
        }
        e += 1
      }
      if (width <= 0 || height <= 0 || width * height * 3 > Int.MaxValue) return None
      if (planar != 1 || sampleFormat != 1) return None
      if (compression != 1 && compression != 5 && compression != 32773) return None
      if (predictor != 1 && predictor != 2) return None
      val gray = photometric == 0 || photometric == 1
      val rgbOk = photometric == 2 && spp >= 3 // extra samples (alpha) rejected below
      if (!gray && !rgbOk) return None
      if (gray && spp != 1) return None
      if (rgbOk && spp != 3) return None
      if (bits.length != spp || bits.exists(_ != 8L)) return None
      if (stripOffs == null || stripCnts == null ||
        stripOffs.length != stripCnts.length || stripOffs.isEmpty) return None

      // strip count must cover the image height
      val rps = math.min(rowsPerStrip, height)
      if (rps <= 0) return None
      val nStrips = ((height + rps - 1) / rps).toInt
      if (stripOffs.length != nStrips) return None

      val w = width.toInt; val h = height.toInt; val ch = spp.toInt
      val raw = new Array[Byte](w * h * ch)
      var filled = 0
      var s = 0
      while (s < nStrips) {
        val so = stripOffs(s); val sc = stripCnts(s)
        if (so < 0 || sc < 0 || so + sc > b.length) return None
        val rowsHere = math.min(rps, height - s * rps).toInt
        val need = rowsHere * w * ch
        if (compression == 1L) {
          if (sc != need) return None
          System.arraycopy(b, so.toInt, raw, filled, need)
        } else if (compression == 5L) { // TIFF-flavor LZW, per strip
          val dec = lzwDecodeTiffStrip(b, so.toInt, sc.toInt, need)
            .getOrElse(return None)
          System.arraycopy(dec, 0, raw, filled, need)
        } else { // PackBits, per strip
          var i = so.toInt; val end = (so + sc).toInt
          var o = filled
          while (i < end && o < filled + need) {
            val n = b(i); i += 1
            if (n >= 0) { // literal run of n+1
              if (i + n + 1 > end || o + n + 1 > filled + need) return None
              System.arraycopy(b, i, raw, o, n + 1)
              i += n + 1; o += n + 1
            } else if (n != -128) { // repeat next byte 1-n times
              if (i >= end) return None
              val cnt = 1 - n
              if (o + cnt > filled + need) return None
              java.util.Arrays.fill(raw, o, o + cnt, b(i))
              i += 1; o += cnt
            } // -128: no-op
          }
          if (o != filled + need) return None
        }
        filled += need
        s += 1
      }
      if (filled != raw.length) return None

      if (predictor == 2L) { // horizontal differencing: rows re-accumulate left
        var y = 0
        while (y < h) {
          val ro = y * w * ch
          var x = 1
          while (x < w) {
            var c = 0
            while (c < ch) {
              raw(ro + x * ch + c) =
                ((raw(ro + x * ch + c) + raw(ro + (x - 1) * ch + c)) & 0xff).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
      }

      val rgb = new Array[Byte](w * h * 3)
      if (ch == 3) System.arraycopy(raw, 0, rgb, 0, rgb.length)
      else {
        val invert = photometric == 0 // WhiteIsZero
        var p = 0
        while (p < w * h) {
          val g = if (invert) (255 - (raw(p) & 0xff)).toByte else raw(p)
          rgb(p * 3) = g; rgb(p * 3 + 1) = g; rgb(p * 3 + 2) = g
          p += 1
        }
      }
      Some(Raster(w, h, rgb))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encoder twin: single-strip, chunky, uncompressed RGB8, little-endian
    * ("II"), tags in the spec-mandated ascending order. Always decodable
    * by [[decodeTiff]] and by any baseline reader.
    */
  def encodeTiff(r: Raster): Array[Byte] = {
    val w = r.width; val h = r.height
    val nTags = 9
    // layout: header(8) | IFD(2 + 9*12 + 4) | bits[3] shorts(6) | strip data
    val ifdOff = 8
    val ifdSize = 2 + nTags * 12 + 4
    val bitsOff = ifdOff + ifdSize
    val dataOff = bitsOff + 6
    val out = java.nio.ByteBuffer.allocate(dataOff + w * h * 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    out.putShort(nTags.toShort)
    def tag(id: Int, typ: Int, cnt: Int, v: Long): Unit = {
      out.putShort(id.toShort).putShort(typ.toShort).putInt(cnt)
      if (typ == 3 && cnt == 1) out.putShort(v.toShort).putShort(0)
      else out.putInt(v.toInt)
    }
    tag(256, 3, 1, w)            // ImageWidth
    tag(257, 3, 1, h)            // ImageLength
    tag(258, 3, 3, bitsOff)      // BitsPerSample -> [8,8,8]
    tag(259, 3, 1, 1)            // Compression: none
    tag(262, 3, 1, 2)            // Photometric: RGB
    tag(273, 4, 1, dataOff)      // StripOffsets
    tag(277, 3, 1, 3)            // SamplesPerPixel
    tag(278, 3, 1, h)            // RowsPerStrip: one strip
    tag(279, 4, 1, w * h * 3)    // StripByteCounts
    out.putInt(0)                // next IFD: none
    out.putShort(8).putShort(8).putShort(8)
    out.put(r.rgb)
    out.array()
  }

  /** Hand-packable TIFF container for the layouts [[encodeTiff]] never
    * emits — gray photometrics (incl. WhiteIsZero inversion), PackBits
    * strips, big-endian byte order, multi-strip addressing. `strips`
    * are the ALREADY-ENCODED per-strip byte payloads (caller applies
    * PackBits when `compression` says so); the container just lays out
    * header, IFD, and strip bytes. Building block for the `tiff_meta`
    * oracle row and the codec specs.
    */
  def tiffContainer(w: Int, h: Int, spp: Int, photometric: Int, compression: Int,
                    rowsPerStrip: Int, strips: Seq[Array[Byte]],
                    bigEndian: Boolean = false, predictor: Int = 1): Array[Byte] = {
    require(spp == 1 || spp == 3, "spp must be 1 or 3")
    val nStrips = strips.length
    val nTags = if (predictor != 1) 10 else 9
    val ifdOff = 8
    val ifdSize = 2 + nTags * 12 + 4
    // value arrays that don't fit inline: bits (spp==3), strip offs/cnts (n>1)
    var extraOff = ifdOff + ifdSize
    val bitsOff = extraOff
    if (spp == 3) extraOff += 6
    val stripOffsOff = extraOff
    if (nStrips > 1) extraOff += 4 * nStrips
    val stripCntsOff = extraOff
    if (nStrips > 1) extraOff += 4 * nStrips
    val dataOff = extraOff
    val total = dataOff + strips.map(_.length).sum
    val out = java.nio.ByteBuffer.allocate(total)
      .order(if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
             else java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bigEndian) out.put('M'.toByte).put('M'.toByte) else out.put('I'.toByte).put('I'.toByte)
    out.putShort(42).putInt(ifdOff)
    out.putShort(nTags.toShort)
    def tag(id: Int, typ: Int, cnt: Int, v: Long): Unit = {
      out.putShort(id.toShort).putShort(typ.toShort).putInt(cnt)
      if (typ == 3 && cnt == 1) { // SHORT inlines left-justified per spec
        out.putShort(v.toShort).putShort(0)
      } else out.putInt(v.toInt)
    }
    val firstData = dataOff
    tag(256, 3, 1, w)
    tag(257, 3, 1, h)
    if (spp == 3) tag(258, 3, 3, bitsOff) else tag(258, 3, 1, 8)
    tag(259, 3, 1, compression)
    tag(262, 3, 1, photometric)
    if (nStrips > 1) tag(273, 4, nStrips, stripOffsOff)
    else tag(273, 4, 1, firstData)
    tag(277, 3, 1, spp)
    tag(278, 3, 1, rowsPerStrip)
    if (nStrips > 1) tag(279, 4, nStrips, stripCntsOff)
    else tag(279, 4, 1, strips.head.length)
    if (predictor != 1) tag(317, 3, 1, predictor)
    out.putInt(0)
    if (spp == 3) out.putShort(8).putShort(8).putShort(8)
    if (nStrips > 1) {
      var off = dataOff
      strips.foreach { st => out.putInt(off); off += st.length }
      strips.foreach(st => out.putInt(st.length))
    }
    strips.foreach(out.put)
    out.array()
  }

  /** TIFF-flavor LZW strip decode (TIFF 6.0 Section 13): 8-bit data
    * alphabet (codes 0–255), Clear = 256, EOI = 257, MSB-FIRST bit
    * packing starting at 9 bits, and the famous EARLY CHANGE — the code
    * width bumps when the next free entry reaches 2^width − 1 (510, 1022,
    * 2046), one code earlier than the GIF rule. Returns exactly
    * `expected` bytes or None.
    */
  private def lzwDecodeTiffStrip(b: Array[Byte], off: Int, len: Int,
      expected: Int): Option[Array[Byte]] = {
    val Clear = 256; val Eoi = 257
    val out = new Array[Byte](expected)
    var outN = 0
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var next = Eoi + 1
    var width = 9
    var bitPos = 0
    val totalBits = len * 8
    var prev = -1
    def emit(code: Int): Boolean = {
      var stack = List.empty[Byte]
      var c = code
      while (c >= Clear) { stack = append(c) :: stack; c = prefix(c) }
      stack = c.toByte :: stack
      for (byte <- stack) {
        if (outN >= expected) return false
        out(outN) = byte; outN += 1
      }
      true
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= Clear) c = prefix(c)
      c.toByte
    }
    while (bitPos + width <= totalBits) {
      var code = 0
      var k = 0
      while (k < width) { // MSB-first
        val bp = bitPos + k
        code = (code << 1) | ((b(off + (bp >> 3)) >> (7 - (bp & 7))) & 1)
        k += 1
      }
      bitPos += width
      if (code == Eoi) return if (outN == expected) Some(out) else None
      else if (code == Clear) {
        next = Eoi + 1; width = 9; prev = -1
      } else {
        if (code > next || (code == next && prev == -1)) return None
        if (prev == -1) {
          if (code >= Clear) return None
          if (!emit(code)) return None
        } else if (code == next) { // KwKwK
          if (next >= 4096) return None
          prefix(next) = prev; append(next) = firstByte(prev); next += 1
          if (!emit(code)) return None
        } else {
          if (!emit(code)) return None
          if (next < 4096) {
            prefix(next) = prev; append(next) = firstByte(code); next += 1
          }
        }
        prev = code
        // early change: bump WIDTH one entry before the table fills it
        if (next == (1 << width) - 1 && width < 12) width += 1
      }
    }
    None // ran out of bits before EOI
  }

  /** Literal-code TIFF LZW stream for fixtures (the decoder's inverse on
    * never-compressing input): Clear, 9-bit literals MSB-first, re-Clear
    * before the early-change width bump would fire, EOI.
    */
  def lzwTiffLiteralStream(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    def putCode(c: Int): Unit = {
      acc = (acc << 9) | c; accBits += 9
      while (accBits >= 8) {
        out.write(((acc >> (accBits - 8)) & 0xff).toInt); accBits -= 8
      }
    }
    putCode(256)
    // n literals after a Clear add n-1 table entries (the first adds
    // none); keep next <= 510 so the early-change bump never fires and
    // every code in the stream stays 9 bits
    var inSeg = 0
    var p = 0
    while (p < data.length) {
      if (inSeg == 253) { putCode(256); inSeg = 0 }
      putCode(data(p) & 0xff)
      inSeg += 1
      p += 1
    }
    putCode(257)
    if (accBits > 0) out.write(((acc << (8 - accBits)) & 0xff).toInt)
    out.toByteArray
  }

  /** TIFF 6.0 Section-9 PackBits compressor (used by fixtures; the
    * decoder's inverse). Greedy: runs of >= 2 repeats become repeat
    * packets, the rest literal packets, both capped at 128.
    */
  def packBits(d: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < d.length) {
      var run = 1
      while (i + run < d.length && d(i + run) == d(i) && run < 128) run += 1
      if (run >= 2) {
        out.write(1 - run); out.write(d(i)); i += run
      } else {
        var lit = 1
        while (i + lit < d.length && lit < 128 &&
          !(i + lit + 1 < d.length && d(i + lit) == d(i + lit + 1))) lit += 1
        out.write(lit - 1); out.write(d, i, lit); i += lit
      }
    }
    out.toByteArray
  }
}
