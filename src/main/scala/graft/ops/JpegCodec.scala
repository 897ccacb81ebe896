package graft.ops

/** Baseline sequential JPEG (ITU-T T.81 / ISO 10918-1), pure JVM — the
  * LOSSY leg of the codec plane next to [[ImageCodec]]'s PNG (DEFLATE) and
  * GIF (LZW): real media corpora are mostly JPEG, so without this kernel
  * the majority of a realistic image corpus would take
  * [[MultimodalOps]]' deterministic fallback path instead of a real decode
  * (ref: Abishek257/ETL_Data_Ingestion has no media surface; this belongs
  * to the mandated multimodal extension plane).
  *
  * Scope — the baseline process, which is what cameras and web encoders
  * overwhelmingly emit:
  *
  *   - SOF0 (baseline), SOF1 (extended sequential — identical decode path
  *     at 8-bit precision), and SOF2 (Huffman PROGRESSIVE: multi-scan
  *     spectral selection + successive approximation, including EOB runs
  *     and AC refinement — see [[decodeProgressive]]); lossless,
  *     hierarchical and arithmetic-coded streams are REJECTED (None), not
  *     misread.
  *   - 8-bit samples, 1 (grayscale) or 3 (YCbCr) components, any sampling
  *     factors 1..4 — 4:4:4, 4:2:2, 4:2:0 and friends all reduce to the
  *     same per-component replication upsample.
  *   - One interleaved scan (all frame components in the single SOS —
  *     the universal baseline layout); DRI/RSTn restart intervals.
  *
  * Determinism contract (the repo-wide engine-parity rule applied to
  * pixels): the IDCT runs on an 8×8 basis table precomputed with
  * `StrictMath` — bit-identical on every JVM — and the YCbCr→RGB transform
  * is integer fixed-point, so a payload decodes to the SAME bytes on every
  * executor, retry, and platform. That is what makes decoded pixels safe
  * inputs to content-addressed dedup keys downstream.
  *
  * Totality contract, same as every [[ImageCodec]] decoder: malformed,
  * truncated, or overflow-crafted payloads return None, never throw — a
  * poison blob can't kill a partition task. Truncation strictness: the
  * entropy decoder treats running out of bits (or meeting an unexpected
  * marker) mid-MCU as corruption and bails, so a cut-off payload is
  * detected rather than padded into a half-gray image.
  *
  * The [[encode]] twin is a complete baseline encoder (Annex K quant +
  * Huffman tables, quality scaling, optional 4:2:0) — it exists so specs
  * and [[graft.sources.MediaGenSource]] can generate REAL entropy-coded
  * payloads that exercise the full decode path at any scale without
  * shipping fixture bytes.
  */
object JpegCodec {
  import ImageCodec.Raster

  /** Internal early-exit for malformed input; caught at the API boundary. */
  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  // ------------------------------------------------------------ constants

  /** Zigzag scan order: stream position k → natural (row-major) index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** DCT basis `C(u)/2 · cos((2x+1)·u·π/16)`, precomputed with StrictMath
    * so the table (and therefore every decoded pixel) is bit-identical on
    * every JVM. Used for both the IDCT (decode) and FDCT (encode).
    */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    0.5 * cu * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  // Annex K (T.81 Tables K.1/K.2) base quantization tables, natural order.
  private val QLumaBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val QChromaBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K (Tables K.3–K.6) typical Huffman tables: (BITS counts 1..16,
  // HUFFVAL symbol list).
  private val DcLumaCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaCounts = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray

  private val AcLumaCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  private val AcChromaCounts = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // ------------------------------------------------------- Huffman decode

  /** Canonical Huffman decode table per T.81 Annex F (MINCODE / MAXCODE /
    * VALPTR), fronted by an 8-bit LOOKAHEAD LUT: codes of length ≤ 8 (the
    * overwhelming majority of symbols in real streams) resolve with one
    * peek + one table read instead of a bit-by-bit walk; longer codes fall
    * back to the Annex F walk. `maxcode(l) = -1` marks a length with no
    * codes.
    */
  private final class Huff(counts: Array[Int], vals: Array[Int]) {
    if (counts.length != 16) bail()
    val total: Int = counts.sum
    if (total > 256 || vals.length < total) bail()
    private val mincode = new Array[Int](17)
    private val maxcode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    // (len << 12) | symbol for every 8-bit prefix whose code fits in 8
    // bits; 0 = long code (walk). Valid entries always have len >= 1, so
    // 0 is unambiguous.
    private val lut = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxcode(l) = code - 1
        } else maxcode(l) = -1
        if (code > (1 << l)) bail() // over-subscribed code space
        code <<= 1
        l += 1
      }
      l = 1
      while (l <= 8) {
        if (maxcode(l) >= 0) {
          var c = mincode(l)
          while (c <= maxcode(l)) {
            val sym = vals(valptr(l) + c - mincode(l))
            val base = c << (8 - l)
            var suffix = 0
            while (suffix < (1 << (8 - l))) {
              lut(base | suffix) = (l << 12) | sym
              suffix += 1
            }
            c += 1
          }
        }
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      val e = lut(br.peek8())
      if (e != 0) { br.consume(e >>> 12); e & 0xfff }
      else {
        var code = br.bit()
        var l = 1
        while (maxcode(l) < 0 || code > maxcode(l)) {
          l += 1
          if (l > 16) bail()
          code = (code << 1) | br.bit()
        }
        vals(valptr(l) + code - mincode(l))
      }
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * un-stuffing, buffered up to 56 bits for the lookahead decode path.
    * Running out of bytes, or meeting a real marker where coded bits are
    * CONSUMED, bails — truncation is corruption here, by the
    * totality-strictness contract in the object doc. `peek8` zero-pads
    * past the end (harmless: a decode using padding bits would have to
    * consume them, which bails), so lookahead never weakens strictness.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nbits = 0
    private var ended = false // hit EOF or a marker; cleared by expectRestart
    /** Buffer 8 more bits; false at EOF/marker (no state consumed). */
    private def fillByte(): Boolean = {
      if (ended || pos >= b.length) { ended = true; false }
      else {
        val v = b(pos) & 0xff
        if (v == 0xff) {
          if (pos + 1 >= b.length || (b(pos + 1) & 0xff) != 0x00) {
            ended = true; return false // marker (or truncated stuffing)
          }
          pos += 2 // stuffed literal 0xFF
        } else pos += 1
        acc = (acc << 8) | v
        nbits += 8
        true
      }
    }
    /** Next 8 bits without consuming, zero-padded past the end. */
    def peek8(): Int = {
      while (nbits < 8 && fillByte()) {}
      if (nbits >= 8) ((acc >>> (nbits - 8)) & 0xff).toInt
      else ((acc << (8 - nbits)) & 0xff).toInt
    }
    def consume(n: Int): Unit = {
      if (n > nbits) bail()
      nbits -= n
    }
    def bit(): Int = {
      if (nbits == 0 && !fillByte()) bail()
      nbits -= 1
      ((acc >>> nbits) & 1L).toInt
    }
    def receive(n: Int): Int = {
      if (n == 0) return 0
      while (nbits < n && fillByte()) {}
      if (n > nbits) bail()
      nbits -= n
      ((acc >>> nbits) & ((1L << n) - 1)).toInt
    }
    /** Drop the current byte's remaining bits (restart alignment). */
    def align(): Unit = nbits -= nbits % 8
    /** Consume an aligned RSTn marker; `n` is the expected index 0..7. A
      * conforming stream pads only within the final byte, so whole
      * buffered bytes at a restart point mean corruption.
      */
    def expectRestart(n: Int): Unit = {
      if (nbits != 0) bail()
      if (pos + 2 > b.length) bail()
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + n)) bail()
      pos += 2
      ended = false
    }
  }

  /** T.81 F.2.2.1 EXTEND: map an s-bit magnitude code to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // --------------------------------------------------------------- decode

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Separable IDCT of one dequantized natural-order block into a sample
    * plane at (ox, oy) — shared by the baseline and progressive paths.
    * `tmp` is caller-provided 64-double scratch.
    */
  private def idctToPlane(coef: Array[Int], tmp: Array[Double],
      plane: Array[Byte], pw: Int, ox: Int, oy: Int): Unit = {
    // DC-only fast path (flat blocks dominate 4:2:0 chroma and background
    // regions): all 64 outputs equal round(c0·(c0·DC)) — BIT-IDENTICAL to
    // the separable passes, whose zero AC terms only ever add ±0.0
    var hasAc = false
    var ci = 1
    while (ci < 64 && !hasAc) { hasAc = coef(ci) != 0; ci += 1 }
    if (!hasAc) {
      val c0 = Cos(0)(0)
      val s0 = Math.round(c0 * (c0 * coef(0))).toInt + 128
      val b0 = (if (s0 < 0) 0 else if (s0 > 255) 255 else s0).toByte
      var y0 = 0
      while (y0 < 8) {
        var x = 0
        while (x < 8) { plane((oy + y0) * pw + ox + x) = b0; x += 1 }
        y0 += 1
      }
      return
    }
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += Cos(u)(x) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    var y0 = 0
    while (y0 < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v2 = 0
        while (v2 < 8) { acc += Cos(v2)(y0) * tmp(v2 * 8 + x); v2 += 1 }
        val s0 = Math.round(acc).toInt + 128
        plane((oy + y0) * pw + ox + x) =
          (if (s0 < 0) 0 else if (s0 > 255) 255 else s0).toByte
        x += 1
      }
      y0 += 1
    }
  }

  /** Upsample (floor-replication on the sampling-factor grids) + YCbCr→RGB
    * (or gray replication) — shared by the baseline and progressive paths.
    */
  private def planesToRgb(planes: Array[Array[Byte]], planeW: Array[Int],
      comps: Array[Comp], w: Int, h: Int, hMax: Int, vMax: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    if (comps.length == 1) {
      val plane = planes(0)
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = plane(y * pw + x)
          val d = (y * w + x) * 3
          out(d) = g; out(d + 1) = g; out(d + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val py = planes(0); val pwy = planeW(0); val cY = comps(0)
      val pb = planes(1); val pwb = planeW(1); val cB = comps(1)
      val pr = planes(2); val pwr = planeW(2); val cR = comps(2)
      var y = 0
      while (y < h) {
        val yY = y * cY.v / vMax; val yB = y * cB.v / vMax; val yR = y * cR.v / vMax
        var x = 0
        while (x < w) {
          val lum = py(yY * pwy + x * cY.h / hMax) & 0xff
          val cb = (pb(yB * pwb + x * cB.h / hMax) & 0xff) - 128
          val cr = (pr(yR * pwr + x * cR.h / hMax) & 0xff) - 128
          // JFIF fixed-point: 1.402, 0.344136, 0.714136, 1.772 at 2^16
          val r0 = lum + ((91881 * cr + 32768) >> 16)
          val g0 = lum - ((22554 * cb + 46802 * cr + 32768) >> 16)
          val b0 = lum + ((116130 * cb + 32768) >> 16)
          val d = (y * w + x) * 3
          out(d) = (if (r0 < 0) 0 else if (r0 > 255) 255 else r0).toByte
          out(d + 1) = (if (g0 < 0) 0 else if (g0 > 255) 255 else g0).toByte
          out(d + 2) = (if (b0 < 0) 0 else if (b0 > 255) 255 else b0).toByte
          x += 1
        }
        y += 1
      }
    }
    out
  }

  def looksLikeJpeg(b: Array[Byte]): Boolean = ImageCodec.looksLikeJpeg(b)

  /** Decode a baseline JPEG payload to packed RGB. Total: None on anything
    * malformed, truncated, progressive, arithmetic-coded, 12-bit, CMYK, or
    * overflow-crafted.
    */
  def decode(b: Array[Byte]): Option[Raster] = {
    try {
      if (!looksLikeJpeg(b)) return None
      def u8(o: Int): Int = { if (o >= b.length) bail(); b(o) & 0xff }
      def u16(o: Int): Int = (u8(o) << 8) | u8(o + 1)

      val qt = new Array[Array[Int]](4) // zigzag-order, indexed by stream k
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var restartInterval = 0
      var w = 0; var h = 0
      var comps: Array[Comp] = null
      var scanSel: Array[(Int, Int, Int)] = null // (compIdx, dcId, acId)
      var pos = 2
      var scanStart = -1

      while (scanStart < 0) {
        if (u8(pos) != 0xff) bail()
        var m = u8(pos + 1)
        pos += 2
        while (m == 0xff) { m = u8(pos); pos += 1 } // fill bytes before marker
        if (m == 0xd9 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) bail() // EOI/TEM/RST before SOS
        else {
          val len = u16(pos)
          if (len < 2 || pos.toLong + len > b.length) bail()
          val s = pos + 2
          val end = pos + len
          m match {
            case 0xdb => // DQT: one or more tables
              var p = s
              while (p < end) {
                val pq = u8(p) >> 4; val tq = u8(p) & 15
                if (pq > 1 || tq > 3) bail()
                val t = new Array[Int](64)
                p += 1
                var k = 0
                while (k < 64) {
                  t(k) = if (pq == 0) u8(p + k) else u16(p + 2 * k)
                  k += 1
                }
                p += (if (pq == 0) 64 else 128)
                if (p > end) bail()
                qt(tq) = t
              }
            case 0xc4 => // DHT: one or more tables
              var p = s
              while (p < end) {
                val tc = u8(p) >> 4; val th = u8(p) & 15
                if (tc > 1 || th > 3) bail()
                val counts = Array.tabulate(16)(i => u8(p + 1 + i))
                val n = counts.sum
                if (p + 17 + n > end) bail()
                val vals = Array.tabulate(n)(i => u8(p + 17 + i))
                val tab = new Huff(counts, vals)
                if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
                p += 17 + n
              }
            case 0xdd => // DRI
              if (len != 4) bail()
              restartInterval = u16(s)
            case 0xc0 | 0xc1 => // baseline / extended sequential Huffman
              if (comps != null) bail()
              if (u8(s) != 8) bail() // 8-bit precision only
              h = u16(s + 1); w = u16(s + 3)
              val nf = u8(s + 5)
              if (w <= 0 || h <= 0 || (nf != 1 && nf != 3)) bail()
              if (w.toLong * h * 3 > Int.MaxValue) bail()
              if (len != 8 + 3 * nf) bail()
              comps = Array.tabulate(nf) { i =>
                val o = s + 6 + 3 * i
                val hv = u8(o + 1)
                val c = Comp(u8(o), hv >> 4, hv & 15, u8(o + 2))
                if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3) bail()
                c
              }
              // a single-component frame is never interleaved: sampling
              // factors carry no meaning, geometry is plain 8×8 blocks
              if (nf == 1) comps = Array(comps(0).copy(h = 1, v = 1))
            case 0xc2 =>
              return decodeProgressive(b) // Huffman progressive: own path
            case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
                0xcd | 0xce | 0xcf | 0xcc | 0xde | 0xdf | 0xdc =>
              bail() // lossless/hierarchical/arithmetic/DNL
            case 0xda => // SOS
              if (comps == null) bail()
              val ns = u8(s)
              if (ns != comps.length) bail() // one interleaved scan only
              scanSel = Array.tabulate(ns) { i =>
                val cs = u8(s + 1 + 2 * i)
                val tt = u8(s + 2 + 2 * i)
                val ci = comps.indexWhere(_.id == cs)
                if (ci < 0) bail()
                (ci, tt >> 4, tt & 15)
              }
              // spectral selection / approximation must be the baseline 0..63/0
              if (u8(s + 1 + 2 * ns) != 0 || u8(s + 2 + 2 * ns) != 63 ||
                u8(s + 3 + 2 * ns) != 0) bail()
              scanStart = end
            case _ => () // APPn / COM / others: skip
          }
          pos = end
        }
      }

      val nc = comps.length
      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
      // per-component sample planes, padded to whole MCUs
      val planeW = new Array[Int](nc)
      val planes = new Array[Array[Byte]](nc)
      var ci = 0
      while (ci < nc) {
        val pw = mcusX.toLong * comps(ci).h * 8
        val ph = mcusY.toLong * comps(ci).v * 8
        if (pw * ph > Int.MaxValue) bail()
        planeW(ci) = pw.toInt
        planes(ci) = new Array[Byte]((pw * ph).toInt)
        ci += 1
      }
      val scanQt = comps.map(c => { if (qt(c.tq) == null) bail(); qt(c.tq) })
      val scanDc = scanSel.map { case (_, d, _) => if (dcTabs(d) == null) bail(); dcTabs(d) }
      val scanAc = scanSel.map { case (_, _, a) => if (acTabs(a) == null) bail(); acTabs(a) }

      val br = new BitReader(b, scanStart)
      val dcPred = new Array[Int](nc)
      val coef = new Array[Int](64)
      val tmp = new Array[Double](64)
      var rstIdx = 0
      var sinceRestart = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && sinceRestart == restartInterval) {
            br.align()
            br.expectRestart(rstIdx)
            rstIdx = (rstIdx + 1) & 7
            java.util.Arrays.fill(dcPred, 0)
            sinceRestart = 0
          }
          var si = 0
          while (si < scanSel.length) {
            val cIdx = scanSel(si)._1
            val c = comps(cIdx)
            val q = scanQt(cIdx)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                // ---- one 8×8 block: entropy decode + dequantize
                java.util.Arrays.fill(coef, 0)
                val t = scanDc(si).decode(br)
                if (t > 11) bail()
                val diff = extend(br.receive(t), t)
                dcPred(cIdx) += diff
                // conforming streams keep the DC predictor in 12-bit range
                // (T.81 F.1.1.5.1); hostile diffs accumulate toward Int
                // overflow and garbage pixels — keep them on the reject path
                if (dcPred(cIdx) < -16384 || dcPred(cIdx) > 16383) bail()
                coef(0) = dcPred(cIdx) * q(0)
                var k = 1
                while (k < 64) {
                  val rs = scanAc(si).decode(br)
                  val r = rs >> 4
                  val ssz = rs & 15
                  if (ssz == 0) {
                    if (r == 15) k += 16 else k = 64 // ZRL / EOB
                  } else {
                    k += r
                    if (k > 63) bail()
                    coef(Zigzag(k)) = extend(br.receive(ssz), ssz) * q(k)
                    k += 1
                  }
                }
                // ---- IDCT (separable, deterministic double basis)
                idctToPlane(coef, tmp, planes(cIdx), planeW(cIdx),
                  (mx * c.h + bx) * 8, (my * c.v + by) * 8)
                bx += 1
              }
              by += 1
            }
            si += 1
          }
          sinceRestart += 1
          mx += 1
        }
        my += 1
      }

      // ---- upsample + color transform to packed RGB
      Some(Raster(w, h, planesToRgb(planes, planeW, comps, w, h, hMax, vMax)))
    } catch {
      case _: Bail => None
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Huffman PROGRESSIVE JPEG (SOF2): coefficients accumulate across
    * multiple scans — DC-first (diff, scaled by the successive-
    * approximation shift), DC-refine (one bit per block), AC-first
    * (run/size with EOB-run codes over a spectral band of one component),
    * AC-refine (the T.81 G.1.2.3 correction-bit walk) — then one
    * dequantize + IDCT pass at EOI. Restart intervals reset DC predictors
    * AND the EOB run, per scan. Memory: one Int per coefficient
    * (Long-guarded), the price of progressive's out-of-order delivery;
    * the baseline path keeps its streaming form untouched. Same totality
    * and determinism contracts as [[decode]].
    */
  private def decodeProgressive(b: Array[Byte]): Option[Raster] = {
    try {
      def u8(o: Int): Int = { if (o >= b.length) bail(); b(o) & 0xff }
      def u16(o: Int): Int = (u8(o) << 8) | u8(o + 1)

      val qt = new Array[Array[Int]](4)
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var restartInterval = 0
      var w = 0; var h = 0
      var comps: Array[Comp] = null
      var hMax = 0; var vMax = 0
      var mcusX = 0; var mcusY = 0
      // per component: padded block grid (interleaved layout), true block
      // dims (non-interleaved layout), and the coefficient store
      var bwPad: Array[Int] = null
      var bhPad: Array[Int] = null
      var blocksW: Array[Int] = null
      var blocksH: Array[Int] = null
      var coefs: Array[Array[Int]] = null

      var pos = 2
      var seenEoi = false
      while (!seenEoi) {
        if (u8(pos) != 0xff) bail()
        var m = u8(pos + 1)
        pos += 2
        while (m == 0xff) { m = u8(pos); pos += 1 }
        if (m == 0xd9) seenEoi = true
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) bail() // stray TEM/RST
        else {
          val len = u16(pos)
          if (len < 2 || pos.toLong + len > b.length) bail()
          val s = pos + 2
          val end = pos + len
          m match {
            case 0xdb =>
              var p = s
              while (p < end) {
                val pq = u8(p) >> 4; val tq = u8(p) & 15
                if (pq > 1 || tq > 3) bail()
                val t = new Array[Int](64)
                p += 1
                var k = 0
                while (k < 64) {
                  t(k) = if (pq == 0) u8(p + k) else u16(p + 2 * k)
                  k += 1
                }
                p += (if (pq == 0) 64 else 128)
                if (p > end) bail()
                qt(tq) = t
              }
            case 0xc4 =>
              var p = s
              while (p < end) {
                val tc = u8(p) >> 4; val th = u8(p) & 15
                if (tc > 1 || th > 3) bail()
                val counts = Array.tabulate(16)(i => u8(p + 1 + i))
                val n = counts.sum
                if (p + 17 + n > end) bail()
                val vals = Array.tabulate(n)(i => u8(p + 17 + i))
                val tab = new Huff(counts, vals)
                if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
                p += 17 + n
              }
            case 0xdd =>
              if (len != 4) bail()
              restartInterval = u16(s)
            case 0xc2 =>
              if (comps != null) bail()
              if (u8(s) != 8) bail()
              h = u16(s + 1); w = u16(s + 3)
              val nf = u8(s + 5)
              if (w <= 0 || h <= 0 || (nf != 1 && nf != 3)) bail()
              if (w.toLong * h * 3 > Int.MaxValue) bail()
              if (len != 8 + 3 * nf) bail()
              comps = Array.tabulate(nf) { i =>
                val o = s + 6 + 3 * i
                val hv = u8(o + 1)
                val c = Comp(u8(o), hv >> 4, hv & 15, u8(o + 2))
                if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3) bail()
                c
              }
              if (nf == 1) comps = Array(comps(0).copy(h = 1, v = 1))
              hMax = comps.map(_.h).max; vMax = comps.map(_.v).max
              mcusX = (w + 8 * hMax - 1) / (8 * hMax)
              mcusY = (h + 8 * vMax - 1) / (8 * vMax)
              bwPad = comps.map(c => mcusX * c.h)
              bhPad = comps.map(c => mcusY * c.v)
              blocksW = comps.map(c => ((w.toLong * c.h + hMax - 1) / hMax + 7).toInt / 8)
              blocksH = comps.map(c => ((h.toLong * c.v + vMax - 1) / vMax + 7).toInt / 8)
              coefs = comps.indices.map { i =>
                val n = bwPad(i).toLong * bhPad(i) * 64
                if (n > Int.MaxValue) bail()
                new Array[Int](n.toInt)
              }.toArray
            case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
                0xcb | 0xcd | 0xce | 0xcf | 0xcc | 0xde | 0xdf | 0xdc =>
              bail() // a second frame class inside a progressive stream
            case 0xda =>
              if (comps == null) bail()
              val ns = u8(s)
              if (ns < 1 || ns > comps.length) bail()
              val sel = Array.tabulate(ns) { i =>
                val cs = u8(s + 1 + 2 * i)
                val tt = u8(s + 2 + 2 * i)
                val ci = comps.indexWhere(_.id == cs)
                if (ci < 0) bail()
                (ci, tt >> 4, tt & 15)
              }
              val ss = u8(s + 1 + 2 * ns)
              val se = u8(s + 2 + 2 * ns)
              val aa = u8(s + 3 + 2 * ns)
              val ah = aa >> 4; val al = aa & 15
              if (ss > 63 || se > 63 || se < ss || al > 13 || ah > 14) bail()
              if (ss == 0 && se != 0) bail() // progressive: DC and AC never share a scan
              if (ss > 0 && ns != 1) bail() // AC scans are single-component
              pos = decodeScan(b, end, sel, ss, se, ah, al, restartInterval,
                comps, dcTabs, acTabs, coefs, bwPad, blocksW, blocksH,
                mcusX, mcusY)
              m = -1 // mark: pos already set past the scan
            case _ => ()
          }
          if (m != -1) pos = end
        }
      }
      if (comps == null) bail()

      // ---- dequantize + IDCT every block, then shared upsample/color
      val scanQt = comps.map(c => { if (qt(c.tq) == null) bail(); qt(c.tq) })
      val planes = new Array[Array[Byte]](comps.length)
      val planeW = new Array[Int](comps.length)
      val block = new Array[Int](64)
      val tmp = new Array[Double](64)
      var ci = 0
      while (ci < comps.length) {
        val pw = bwPad(ci) * 8
        val ph = bhPad(ci) * 8
        if (pw.toLong * ph > Int.MaxValue) bail()
        planes(ci) = new Array[Byte](pw * ph)
        planeW(ci) = pw
        val cf = coefs(ci)
        val q = scanQt(ci)
        var bi = 0
        val nBlocks = bwPad(ci) * bhPad(ci)
        while (bi < nBlocks) {
          var k = 0
          while (k < 64) {
            // coefficient store is ZIGZAG-indexed per block; dequantize
            // into natural order for the IDCT
            block(Zigzag(k)) = cf(bi * 64 + k) * q(k)
            k += 1
          }
          idctToPlane(block, tmp, planes(ci), pw,
            (bi % bwPad(ci)) * 8, (bi / bwPad(ci)) * 8)
          bi += 1
        }
        ci += 1
      }
      Some(Raster(w, h, planesToRgb(planes, planeW, comps, w, h, hMax, vMax)))
    } catch {
      case _: Bail => None
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Entropy-decode one progressive scan starting at `start`; returns the
    * position of the first byte after the scan's entropy data (the next
    * marker's 0xFF). Coefficients accumulate ZIGZAG-indexed into `coefs`.
    */
  private def decodeScan(b: Array[Byte], start: Int,
      sel: Array[(Int, Int, Int)], ss: Int, se: Int, ah: Int, al: Int,
      restartInterval: Int, comps: Array[Comp],
      dcTabs: Array[Huff], acTabs: Array[Huff],
      coefs: Array[Array[Int]], bwPad: Array[Int],
      blocksW: Array[Int], blocksH: Array[Int],
      mcusX: Int, mcusY: Int): Int = {
    val br = new BitReader(b, start)
    val dcPred = new Array[Int](comps.length)
    var eobrun = 0
    var rstIdx = 0
    var sinceRestart = 0

    def maybeRestart(): Unit =
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        br.align()
        br.expectRestart(rstIdx)
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
        sinceRestart = 0
      }

    // ---- per-block scan kernels (coef slices are zigzag-indexed)
    def dcFirst(ci: Int, dc: Huff, cf: Array[Int], off: Int): Unit = {
      val t = dc.decode(br)
      if (t > 15) bail()
      dcPred(ci) += extend(br.receive(t), t)
      // same hostile-stream clamp as the baseline path: a conforming DC
      // predictor stays in 12-bit range, overflow goes to the reject path
      if (dcPred(ci) < -16384 || dcPred(ci) > 16383) bail()
      cf(off) = dcPred(ci) << al
    }
    def dcRefine(cf: Array[Int], off: Int): Unit =
      if (br.bit() == 1) cf(off) |= (1 << al)
    def acFirst(ac: Huff, cf: Array[Int], off: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = ac.decode(br)
        val r = rs >> 4
        val sz = rs & 15
        if (sz == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.receive(r)
            return
          }
        } else {
          k += r
          if (k > se) bail()
          cf(off + k) = extend(br.receive(sz), sz) << al
          k += 1
        }
      }
    }
    def acRefine(ac: Huff, cf: Array[Int], off: Int): Unit = {
      val p1 = 1 << al
      val m1 = -1 << al
      var k = ss
      if (eobrun == 0) {
        var done = false
        while (k <= se && !done) {
          val rs = ac.decode(br)
          var r = rs >> 4
          val sz = rs & 15
          var newval = 0
          if (sz == 0) {
            if (r != 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += br.receive(r)
              done = true // fall through to the EOB correction phase
            } // r == 15: ZRL — skip 16 zero-history coeffs, correcting en route
          } else {
            if (sz != 1) bail()
            newval = if (br.bit() == 1) p1 else m1
          }
          if (!done) {
            var placed = false
            while (k <= se && !placed) {
              val c = cf(off + k)
              if (c != 0) {
                if (br.bit() == 1 && (c & p1) == 0)
                  cf(off + k) = c + (if (c >= 0) p1 else m1)
              } else {
                if (r == 0) {
                  if (newval != 0) cf(off + k) = newval
                  placed = true
                } else r -= 1
              }
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val c = cf(off + k)
          if (c != 0) {
            if (br.bit() == 1 && (c & p1) == 0)
              cf(off + k) = c + (if (c >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
    }

    if (ss == 0) {
      // DC scan. Interleaved (ns > 1): MCU geometry; single-component:
      // the component's own (unpadded) block grid.
      val scanDc: Array[Huff] =
        if (ah == 0) sel.map { case (_, d, _) => if (dcTabs(d) == null) bail(); dcTabs(d) }
        else sel.map(_ => null) // refinement reads raw bits, no table
      if (sel.length > 1) {
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            maybeRestart()
            var si = 0
            while (si < sel.length) {
              val ci = sel(si)._1
              val c = comps(ci)
              var by = 0
              while (by < c.v) {
                var bx = 0
                while (bx < c.h) {
                  val off = ((my * c.v + by) * bwPad(ci) + mx * c.h + bx) * 64
                  if (ah == 0) dcFirst(ci, scanDc(si), coefs(ci), off)
                  else dcRefine(coefs(ci), off)
                  bx += 1
                }
                by += 1
              }
              si += 1
            }
            sinceRestart += 1
            mx += 1
          }
          my += 1
        }
      } else {
        val ci = sel(0)._1
        var by = 0
        while (by < blocksH(ci)) {
          var bx = 0
          while (bx < blocksW(ci)) {
            maybeRestart()
            val off = (by * bwPad(ci) + bx) * 64
            if (ah == 0) dcFirst(ci, scanDc(0), coefs(ci), off)
            else dcRefine(coefs(ci), off)
            sinceRestart += 1
            bx += 1
          }
          by += 1
        }
      }
    } else {
      // AC scan: always one component, its own block grid
      val ci = sel(0)._1
      val ac = acTabs(sel(0)._3)
      if (ac == null) bail()
      var by = 0
      while (by < blocksH(ci)) {
        var bx = 0
        while (bx < blocksW(ci)) {
          maybeRestart()
          val off = (by * bwPad(ci) + bx) * 64
          if (ah == 0) acFirst(ac, coefs(ci), off)
          else acRefine(ac, coefs(ci), off)
          sinceRestart += 1
          bx += 1
        }
        by += 1
      }
    }

    // locate the next marker after the scan's entropy bytes: skip stuffed
    // 0xFF00 pairs and any RSTn the loop structure didn't consume exactly
    // (a conforming stream leaves none, but byte-align slack is legal)
    br.align()
    var p = br.pos
    while (p + 1 < b.length &&
      !((b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) != 0x00 &&
        !((b(p + 1) & 0xff) >= 0xd0 && (b(p + 1) & 0xff) <= 0xd7))) p += 1
    if (p + 1 >= b.length) bail()
    p
  }

  // --------------------------------------------------------------- encode

  /** MSB-first bit writer with 0xFF00 byte stuffing; flush pads the final
    * partial byte with 1-bits (T.81 B.1.1.5).
    */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) put(0xff, 8 - nbits)
  }

  /** Canonical Huffman ENCODE table (symbol → (code, length)) from the same
    * BITS/HUFFVAL pair the decoder consumes — T.81 Annex C.
    */
  private final class HuffEnc(counts: Array[Int], vals: Array[Int]) {
    val code = new Array[Int](256)
    val size = new Array[Int](256)
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < counts(l - 1)) {
          code(vals(k)) = c
          size(vals(k)) = l
          c += 1; k += 1; i += 1
        }
        c <<= 1
        l += 1
      }
    }
  }

  /** Bits needed for magnitude `v` (the JPEG category), 0 for 0. */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** IJG quality → per-entry scaled quant table (natural order), entries
    * clamped to 1..255 so the 8-bit DQT form always suffices.
    */
  private def scaledTable(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { v =>
      val s = (v * scale + 50) / 100
      math.max(1, math.min(255, s))
    }
  }

  /** Encode packed RGB as baseline JPEG. `subsample420` emits 4:2:0 (the
    * common camera layout — exercises the decoder's upsample path);
    * otherwise 4:4:4. `restartEvery` > 0 emits a DRI segment and RSTn
    * markers every that-many MCUs (exercises the decoder's restart path).
    * Output is a complete JFIF stream: SOI, APP0, DQT×2, SOF0, DHT×4,
    * [DRI,] SOS, entropy data, EOI.
    */
  def encode(r: Raster, quality: Int = 85, subsample420: Boolean = false,
      restartEvery: Int = 0): Array[Byte] = {
    val w = r.width; val h = r.height
    val qy = scaledTable(QLumaBase, quality)
    val qc = scaledTable(QChromaBase, quality)
    val dcY = new HuffEnc(DcLumaCounts, DcLumaVals)
    val dcC = new HuffEnc(DcChromaCounts, DcChromaVals)
    val acY = new HuffEnc(AcLumaCounts, AcLumaVals)
    val acC = new HuffEnc(AcChromaCounts, AcChromaVals)

    // ---- RGB → full-resolution YCbCr planes (fixed-point JFIF forward)
    val n = w * h
    val yP = new Array[Int](n); val bP = new Array[Int](n); val rP = new Array[Int](n)
    var i = 0
    while (i < n) {
      val rr = r.rgb(i * 3) & 0xff
      val gg = r.rgb(i * 3 + 1) & 0xff
      val bb = r.rgb(i * 3 + 2) & 0xff
      // 0.299/0.587/0.114; 0.168736/0.331264/0.5; 0.5/0.418688/0.081312
      yP(i) = (19595 * rr + 38470 * gg + 7471 * bb + 32768) >> 16
      bP(i) = ((-11059 * rr - 21709 * gg + 32768 * bb + 32768) >> 16) + 128
      rP(i) = ((32768 * rr - 27439 * gg - 5329 * bb + 32768) >> 16) + 128
      i += 1
    }
    def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }

    marker(0xd8) // SOI
    marker(0xe0) // APP0 / JFIF
    u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0) // units: none
    u16(1); u16(1) // aspect ratio
    out.write(0); out.write(0) // no thumbnail

    def dqt(id: Int, t: Array[Int]): Unit = {
      marker(0xdb); u16(2 + 1 + 64); out.write(id)
      var k = 0
      while (k < 64) { out.write(t(Zigzag(k))); k += 1 }
    }
    dqt(0, qy); dqt(1, qc)

    val hs = if (subsample420) 2 else 1
    marker(0xc0) // SOF0
    u16(8 + 3 * 3)
    out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write((hs << 4) | hs); out.write(0) // Y
    out.write(2); out.write(0x11); out.write(1)           // Cb
    out.write(3); out.write(0x11); out.write(1)           // Cr

    def dht(tc: Int, th: Int, counts: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write((tc << 4) | th)
      counts.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, 0, DcLumaCounts, DcLumaVals)
    dht(1, 0, AcLumaCounts, AcLumaVals)
    dht(0, 1, DcChromaCounts, DcChromaVals)
    dht(1, 1, AcChromaCounts, AcChromaVals)

    if (restartEvery > 0) { marker(0xdd); u16(4); u16(restartEvery) }

    marker(0xda) // SOS
    u16(6 + 2 * 3)
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0)

    val bw = new BitWriter(out)
    val blk = new Array[Int](64)
    val blkIn = new Array[Int](64)
    val fdctTmp = new Array[Double](64)

    /** Forward DCT + quantize + entropy-code one 8×8 block whose samples
      * come from `sample(x, y)` (already level-shiftable 0..255).
      */
    def codeBlock(sample: (Int, Int) => Int, q: Array[Int], dc: HuffEnc, ac: HuffEnc,
        pred: Int): Int = {
      // pull the tile once (64 sampler calls) instead of per-basis-term
      var si = 0
      while (si < 64) { blkIn(si) = sample(si % 8, si / 8) - 128; si += 1 }
      // FDCT: F(u,v) = Σx Σy Cos(u)(x)·Cos(v)(y)·(s(x,y)−128), separable
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var acc = 0.0
          var x = 0
          while (x < 8) { acc += Cos(u)(x) * blkIn(v * 8 + x); x += 1 }
          fdctTmp(v * 8 + u) = acc
          u += 1
        }
        v += 1
      }
      var u = 0
      while (u < 8) {
        var v2 = 0
        while (v2 < 8) {
          var acc = 0.0
          var y = 0
          while (y < 8) { acc += Cos(v2)(y) * fdctTmp(y * 8 + u); y += 1 }
          val nat = v2 * 8 + u
          blk(nat) = Math.round(acc / q(nat)).toInt
          v2 += 1
        }
        u += 1
      }
      // DC difference
      val dcVal = blk(0)
      val diff = dcVal - pred
      val s = category(diff)
      bw.put(dc.code(s), dc.size(s))
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC run-length
      var run = 0
      var k = 1
      while (k < 64) {
        val c = blk(Zigzag(k))
        if (c == 0) run += 1
        else {
          while (run > 15) { bw.put(ac.code(0xf0), ac.size(0xf0)); run -= 16 }
          val sz = category(c)
          val rs = (run << 4) | sz
          bw.put(ac.code(rs), ac.size(rs))
          bw.put(if (c < 0) c + (1 << sz) - 1 else c, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(ac.code(0x00), ac.size(0x00)) // EOB
      dcVal
    }

    // edge-replicated sampler over a full-res plane
    def at(p: Array[Int], x: Int, y: Int): Int = {
      val cx = if (x >= w) w - 1 else x
      val cy = if (y >= h) h - 1 else y
      p(cy * w + cx)
    }

    var predY = 0; var predB = 0; var predR = 0
    var sinceRestart = 0
    var rstIdx = 0
    /** Before each MCU: emit an aligned RSTn and reset predictors when the
      * restart interval has elapsed (mirror of the decoder's contract).
      */
    def maybeRestart(): Unit =
      if (restartEvery > 0 && sinceRestart == restartEvery) {
        bw.flush()
        marker(0xd0 + rstIdx)
        rstIdx = (rstIdx + 1) & 7
        predY = 0; predB = 0; predR = 0
        sinceRestart = 0
      }
    if (!subsample420) {
      // 4:4:4 — MCU is one 8×8 block per component
      val mcusX = (w + 7) / 8; val mcusY = (h + 7) / 8
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          maybeRestart()
          val ox = mx * 8; val oy = my * 8
          predY = codeBlock((x, y) => at(yP, ox + x, oy + y), qy, dcY, acY, predY)
          predB = codeBlock((x, y) => clamp255(at(bP, ox + x, oy + y)), qc, dcC, acC, predB)
          predR = codeBlock((x, y) => clamp255(at(rP, ox + x, oy + y)), qc, dcC, acC, predR)
          sinceRestart += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // 4:2:0 — four Y blocks then one Cb and one Cr per 16×16 MCU; chroma
      // is the rounded mean of each 2×2 pixel quad (edge-replicated)
      def chroma(p: Array[Int], cx: Int, cy: Int): Int = {
        val x0 = cx * 2; val y0 = cy * 2
        clamp255((at(p, x0, y0) + at(p, x0 + 1, y0) + at(p, x0, y0 + 1) +
          at(p, x0 + 1, y0 + 1) + 2) / 4)
      }
      val mcusX = (w + 15) / 16; val mcusY = (h + 15) / 16
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          maybeRestart()
          var by = 0
          while (by < 2) {
            var bx = 0
            while (bx < 2) {
              val ox = (mx * 2 + bx) * 8; val oy = (my * 2 + by) * 8
              predY = codeBlock((x, y) => at(yP, ox + x, oy + y), qy, dcY, acY, predY)
              bx += 1
            }
            by += 1
          }
          val cox = mx * 8; val coy = my * 8
          predB = codeBlock((x, y) => chroma(bP, cox + x, coy + y), qc, dcC, acC, predB)
          predR = codeBlock((x, y) => chroma(rP, cox + x, coy + y), qc, dcC, acC, predR)
          sinceRestart += 1
          mx += 1
        }
        my += 1
      }
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
