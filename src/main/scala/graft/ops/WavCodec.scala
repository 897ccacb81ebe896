package graft.ops

/** Pure-JVM WAV (RIFF) PCM codec — the audio member of the uncompressed
  * codec family next to [[ImageCodec]] (PPM/BMP). Supports the
  * uncompressed interchange cases: format 1 (integer PCM) at 8-bit
  * unsigned and 16/24/32-bit signed, format 3 (IEEE float) at 32/64-bit,
  * the G.711 telephony companders (format 6 A-law, format 7 μ-law, both
  * 8-bit), and WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping any of them —
  * any channel count, via proper RIFF chunk traversal (fmt / data chunks
  * in any order, unknown chunks skipped, word-aligned).
  *
  * Same totality contract as ImageCodec: malformed or truncated payloads
  * return None, never throw — a poison blob degrades, it doesn't kill the
  * task.
  *
  * Samples are held interleaved as 16-bit signed, normalized
  * DETERMINISTICALLY: 8-bit widens exactly ((b − 128) << 8); 24/32-bit
  * keep their high 16 bits (arithmetic shift — the standard narrowing);
  * floats scale by 32768 with round-half-up and clamp to the int16 range
  * (NaN rounds to 0 — a poison sample degrades to silence rather than
  * poisoning the statistic). Every derived statistic downstream is then
  * integer-exact and bit-identical across engines.
  */
object WavCodec {

  /** Decoded PCM: interleaved 16-bit samples, `nFrames = samples / channels`. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short]) {
    require(channels > 0 && samples.length % channels == 0, "ragged PCM")
    def nFrames: Int = samples.length / channels
    def durationMs: Long = nFrames.toLong * 1000L / sampleRate
  }

  def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def u16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def i64(b: Array[Byte], o: Int): Long =
    (i32(b, o) & 0xffffffffL) | (i32(b, o + 4).toLong << 32)

  /** (audioFormat, bitsPerSample) pairs this codec decodes. */
  private def supported(af: Int, bits: Int): Boolean =
    (af == 1 && (bits == 8 || bits == 16 || bits == 24 || bits == 32)) ||
      (af == 3 && (bits == 32 || bits == 64)) ||
      ((af == 6 || af == 7) && bits == 8) // G.711 A-law / μ-law

  /** G.711 μ-law expansion (ITU-T G.711, the classic CCITT table as an
    * integer formula): complement, bias-shift the mantissa by the segment
    * exponent, re-subtract the bias. Range ±32124; 0xff and 0x7f are the
    * two zeros.
    */
  private[ops] def ulaw2linear(u: Int): Short = {
    val v = ~u & 0xff
    val t = (((v & 0xf) << 3) + 0x84) << ((v >> 4) & 7)
    (if ((v & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** G.711 A-law expansion: toggle the even bits, then segment-shift the
    * mantissa (segment 0 adds the half-step 8, higher segments the 0x108
    * bias before the shift). Range ±32256; in A-law a SET sign bit means
    * positive.
    */
  private[ops] def alaw2linear(a: Int): Short = {
    val w = (a ^ 0x55) & 0xff
    val seg = (w >> 4) & 7
    val base = (w & 0xf) << 4
    val t =
      if (seg == 0) base + 8
      else (base + 0x108) << (seg - 1)
    (if ((w & 0x80) != 0) t else -t).toShort
  }

  def decodeWav(b: Array[Byte]): Option[Pcm] = {
    try {
      if (!looksLikeWav(b)) return None
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None // (audioFormat, channels, sampleRate, bits) packed below
      var bits = 0
      var blockAlign = 0
      var spb = -1 // IMA ADPCM samples-per-block (fmt extension)
      var factFrames = -1L // fact chunk: total frames (trims ADPCM pad)
      var data: Option[(Int, Int)] = None // (offset, length)
      while (off + 8 <= b.length) {
        val id = new String(b, off, 4, "US-ASCII")
        val size = i32(b, off + 4)
        if (size < 0 || off + 8 + size > b.length) {
          // truncated chunk: a well-formed file never has one
          return None
        }
        id match {
          case "fmt " if size >= 16 =>
            var audioFormat = u16(b, off + 8)
            val channels = u16(b, off + 10)
            val rate = i32(b, off + 12)
            blockAlign = u16(b, off + 20)
            bits = u16(b, off + 22)
            // WAVE_FORMAT_EXTENSIBLE: the real format code is the first
            // word of the SubFormat GUID (fmt offset 24)
            if (audioFormat == 0xfffe && size >= 40) audioFormat = u16(b, off + 8 + 24)
            else if (audioFormat == 0x11 && size >= 20) spb = u16(b, off + 26)
            fmt = Some((audioFormat, channels, rate))
          case "fact" if size >= 4 => factFrames = i32(b, off + 8) & 0xffffffffL
          case "data" => data = Some((off + 8, size))
          case _ => () // LIST, cue, etc. — skip
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      (fmt, data) match {
        case (Some((af, ch, rate)), Some((doff, dlen)))
            if af == 0x11 && (ch == 1 || ch == 2) && rate > 0 && bits == 4 =>
          decodeImaAdpcm(b, doff, dlen, ch, rate, blockAlign, spb, factFrames)
        case (Some((af, ch, rate)), Some((doff, dlen)))
            if ch > 0 && rate > 0 && supported(af, bits) =>
          val bytesPerSample = bits / 8
          val n = dlen / bytesPerSample
          if (n % ch != 0) return None
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            val o = doff + i * bytesPerSample
            out(i) =
              if (af == 7) ulaw2linear(b(o) & 0xff)
              else if (af == 6) alaw2linear(b(o) & 0xff)
              else if (af == 1) bits match {
                case 16 => u16(b, o).toShort
                case 8 => (((b(o) & 0xff) - 128) << 8).toShort // unsigned, widened exactly
                case 24 => // sign via the top byte, keep the high 16 bits
                  ((((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | (b(o + 2).toInt << 16))) >> 8).toShort
                case _ => (i32(b, o) >> 16).toShort // 32-bit int
              } else { // format 3: IEEE float, scaled + clamped; NaN -> 0
                val x =
                  if (bits == 32) java.lang.Float.intBitsToFloat(i32(b, o)).toDouble
                  else java.lang.Double.longBitsToDouble(i64(b, o))
                val v = Math.round(x * 32768.0)
                (if (v > 32767L) 32767L else if (v < -32768L) -32768L else v).toShort
              }
            i += 1
          }
          Some(Pcm(rate, ch, out))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** IMA/DVI ADPCM tables (public IMA ADPCM specification / RFC 3551's
    * DVI4 description): 89-entry step sizes, 8-entry index adaptation.
    */
  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Mutable (predictor, step index) decode/encode state, advanced one
    * nibble at a time with the canonical bit-decomposed delta
    * (step>>3 + conditional step/step>>1/step>>2 terms — NOT a float
    * multiply), int16-clamped predictor, 0..88-clamped index.
    */
  private final class AdpcmState(var pred: Int, var idx: Int) {
    def decode(n: Int): Short = {
      val st = StepTable(idx)
      var diff = st >> 3
      if ((n & 1) != 0) diff += st >> 2
      if ((n & 2) != 0) diff += st >> 1
      if ((n & 4) != 0) diff += st
      pred = if ((n & 8) != 0) pred - diff else pred + diff
      if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
      idx += IndexTable(n & 7)
      if (idx < 0) idx = 0 else if (idx > 88) idx = 88
      pred.toShort
    }
    /** Quantize `sample` against the current state, advance, return the nibble. */
    def encode(sample: Int): Int = {
      val st = StepTable(idx)
      var diff = sample - pred
      var n = 0
      if (diff < 0) { n = 8; diff = -diff }
      if (diff >= st) { n |= 4; diff -= st }
      if (diff >= (st >> 1)) { n |= 2; diff -= st >> 1 }
      if (diff >= (st >> 2)) n |= 1
      decode(n)
      n
    }
  }

  /** IMA ADPCM (WAV format 0x11) block decode: per block, a 4-byte header
    * per channel (int16 predictor = the block's first sample, step index,
    * reserved byte) then nibble data — mono packs low-nibble-first;
    * stereo interleaves 4-byte words (8 samples) per channel. `spb` from
    * the fmt extension when present (validated against blockAlign),
    * derived otherwise; a `fact` chunk trims the encoder's final-block
    * padding. Whole blocks only — a truncated tail is a malformed file.
    */
  private def decodeImaAdpcm(b: Array[Byte], doff: Int, dlen: Int, ch: Int,
      rate: Int, blockAlign: Int, spb: Int, factFrames: Long): Option[Pcm] = {
    if (blockAlign < 4 * ch + 4 * ch || blockAlign % (4 * ch) != 0) return None
    val derived = (blockAlign - 4 * ch) * 2 / ch + 1
    if (spb > 0 && spb != derived) return None
    val perBlock = derived
    if (dlen <= 0 || dlen % blockAlign != 0) return None
    val nBlocks = dlen / blockAlign
    val totalFrames = nBlocks.toLong * perBlock
    if (totalFrames * ch > Int.MaxValue / 2) return None
    val keep = if (factFrames >= 0) {
      if (factFrames > totalFrames || totalFrames - factFrames >= perBlock) return None
      factFrames.toInt
    } else totalFrames.toInt
    val out = new Array[Short](keep * ch)
    var blk = 0
    while (blk < nBlocks) {
      val bo = doff + blk * blockAlign
      val states = Array.tabulate(ch) { c =>
        val ho = bo + c * 4
        val pred = u16(b, ho).toShort.toInt
        val idx = b(ho + 2) & 0xff
        if (idx > 88 || b(ho + 3) != 0) return None
        new AdpcmState(pred, idx)
      }
      val baseFrame = blk * perBlock
      // frame 0 of the block is the header predictor itself
      var c = 0
      while (c < ch) {
        val f = baseFrame
        if (f < keep) out(f * ch + c) = states(c).pred.toShort
        c += 1
      }
      // nibble data: mono = a flat low-first stream; stereo = 4-byte
      // words alternating channels, each word 8 samples for its channel
      val dataOff = bo + 4 * ch
      val words = (blockAlign - 4 * ch) / 4 // 4-byte groups
      var wordI = 0
      while (wordI < words) {
        val wc = if (ch == 1) 0 else wordI % ch
        val chunkIdx = if (ch == 1) wordI else wordI / ch // per-channel word position
        var byteI = 0
        while (byteI < 4) {
          val byte = b(dataOff + wordI * 4 + byteI) & 0xff
          var half = 0
          while (half < 2) {
            val n = if (half == 0) byte & 0xf else byte >> 4
            val sampleIdx = chunkIdx * 8 + byteI * 2 + half // within channel, after frame 0
            val f = baseFrame + 1 + sampleIdx
            val v = states(wc).decode(n)
            if (f < keep && f < baseFrame + perBlock) out(f * ch + wc) = v
            half += 1
          }
          byteI += 1
        }
        wordI += 1
      }
      blk += 1
    }
    Some(Pcm(rate, ch, out))
  }

  /** IMA ADPCM (format 0x11) encoder twin: the standard bit-decomposed
    * quantizer with (predictor, index) state carried ACROSS blocks (each
    * block header re-materializes the running state, so blocks remain
    * independently decodable). The final partial block is zero-nibble
    * padded and a `fact` chunk records the true frame count, which
    * [[decodeWav]] trims back. Mono or stereo.
    */
  def encodeImaAdpcm(p: Pcm, samplesPerBlock: Int = 505): Array[Byte] = {
    require(p.channels == 1 || p.channels == 2, "mono or stereo only")
    require(samplesPerBlock > 1 && (samplesPerBlock - 1) % 8 == 0,
      "samplesPerBlock - 1 must be a multiple of 8")
    val ch = p.channels
    val blockAlign = 4 * ch + (samplesPerBlock - 1) / 2 * ch
    val frames = p.nFrames
    val nBlocks = math.max(1, (frames + samplesPerBlock - 1) / samplesPerBlock)
    val data = new Array[Byte](nBlocks * blockAlign)
    val states = Array.fill(ch)(new AdpcmState(0, 0))
    def sampleAt(f: Int, c: Int): Int =
      if (f < frames) p.samples(f * ch + c).toInt else states(c).pred
    var blk = 0
    while (blk < nBlocks) {
      val bo = blk * blockAlign
      val baseFrame = blk * samplesPerBlock
      var c = 0
      while (c < ch) {
        // header: running predictor snaps to the block's first sample
        states(c).pred = sampleAt(baseFrame, c)
        val ho = bo + c * 4
        data(ho) = (states(c).pred & 0xff).toByte
        data(ho + 1) = ((states(c).pred >> 8) & 0xff).toByte
        data(ho + 2) = states(c).idx.toByte
        data(ho + 3) = 0
        c += 1
      }
      val dataOff = bo + 4 * ch
      val words = (blockAlign - 4 * ch) / 4
      var wordI = 0
      while (wordI < words) {
        val wc = if (ch == 1) 0 else wordI % ch
        val chunkIdx = if (ch == 1) wordI else wordI / ch
        var byteI = 0
        while (byteI < 4) {
          var byte = 0
          var half = 0
          while (half < 2) {
            val f = baseFrame + 1 + chunkIdx * 8 + byteI * 2 + half
            val n = states(wc).encode(sampleAt(f, wc))
            byte |= (if (half == 0) n else n << 4)
            half += 1
          }
          data(dataOff + wordI * 4 + byteI) = byte.toByte
          byteI += 1
        }
        wordI += 1
      }
      blk += 1
    }
    // container: fmt (20 bytes, cbSize=2 + samplesPerBlock) + fact + data
    val pad = data.length & 1
    val buf = java.nio.ByteBuffer.allocate(12 + 28 + 12 + 8 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + 28 + 12 + 8 + data.length + pad)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11).putShort(ch.toShort).putInt(p.sampleRate)
      .putInt(p.sampleRate * blockAlign / samplesPerBlock) // avg byte rate
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(samplesPerBlock.toShort)
    buf.put("fact".getBytes("US-ASCII")).putInt(4).putInt(frames)
    buf.put("data".getBytes("US-ASCII")).putInt(data.length)
    buf.put(data)
    buf.array()
  }

  /** Hand-packable RIFF/WAVE container around pre-encoded sample data —
    * formats [[encodeWav]] (16-bit-only) can't emit. The `wav_depth_meta`
    * oracle row reaches the 8/24-bit integer and IEEE-float widening
    * paths of [[decodeWav]] through it.
    */
  def wavContainer(rate: Int, channels: Int, bits: Int, audioFormat: Int,
                   data: Array[Byte]): Array[Byte] = {
    val pad = data.length & 1 // RIFF chunks are word-aligned
    val buf = java.nio.ByteBuffer.allocate(44 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length + pad)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(audioFormat.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * bits / 8) // byte rate
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(data.length)
    buf.put(data)
    buf.array()
  }

  /** Canonical 16-bit PCM encode (the round-trip twin of decodeWav). */
  def encodeWav(p: Pcm): Array[Byte] = {
    val dataLen = p.samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(p.channels.toShort).putInt(p.sampleRate)
      .putInt(p.sampleRate * p.channels * 2) // byte rate
      .putShort((p.channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    p.samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** Integer-exact RMS in milli-units of full scale (0..1000): frames are
    * mono-mixed by exact integer average first, the sum of squares
    * accumulates in Long (mono² ≤ 2^30, so the sum is exact up to ~2^33
    * frames ≈ 54 hours at 44.1 kHz — far past any single payload), and
    * only the final sqrt touches floating point (IEEE-deterministic on an
    * exact integer ratio).
    */
  /** Per-frame energy contour: sum of |mono sample| over each FULL
    * frame of `frame` samples (the trailing partial frame is dropped —
    * both engines must agree on frame count, and a short tail would make
    * the last energy length-dependent). The contour is the input to the
    * audio fingerprint (audio_contour_hash): like image dHash, the
    * DIRECTION of energy change frame-to-frame survives gain changes
    * that shift every absolute energy.
    */
  def frameEnergies(p: Pcm, frame: Int): Array[Long] = {
    require(frame > 0, "frame must be positive")
    val nf = p.nFrames / frame
    val out = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var acc = 0L
      var i = 0
      while (i < frame) {
        val base = (f * frame + i) * p.channels
        var c = 0
        var m = 0L
        while (c < p.channels) { m += p.samples(base + c); c += 1 }
        acc += math.abs(m / p.channels)
        i += 1
      }
      out(f) = acc
      f += 1
    }
    out
  }

  def rmsMilli(p: Pcm, from: Int = 0, until: Int = Int.MaxValue): Long = {
    val hi = math.min(p.nFrames, until)
    if (hi <= from) return 0L
    var sumSq = 0L
    var f = from
    while (f < hi) {
      var c = 0
      var acc = 0L
      while (c < p.channels) { acc += p.samples(f * p.channels + c); c += 1 }
      val mono = acc / p.channels
      sumSq += mono * mono
      f += 1
    }
    math.round(1000.0 * math.sqrt(sumSq.toDouble / (hi - from)) / 32768.0)
  }

  /** Peak absolute mono amplitude in milli-units of full scale. */
  def peakMilli(p: Pcm): Long = {
    var peak = 0L
    var f = 0
    while (f < p.nFrames) {
      var c = 0
      var acc = 0L
      while (c < p.channels) { acc += p.samples(f * p.channels + c); c += 1 }
      val mono = math.abs(acc / p.channels)
      if (mono > peak) peak = mono
      f += 1
    }
    math.round(1000.0 * peak / 32768.0)
  }
}
