package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Sample-exact pins for the WAV PCM codec: RIFF chunk traversal (unknown
  * chunks, word alignment), 16/8-bit decode, stereo mono-mix, integer RMS
  * and peak, and the totality contract on malformed payloads.
  */
class WavCodecSpec extends AnyFunSuite {
  import WavCodec._

  test("encode -> decode round trip preserves rate, channels and every sample") {
    val p = Pcm(16000, 2, Array[Short](0, 100, -100, 32767, -32768, 7, 8, -9))
    val back = decodeWav(encodeWav(p)).get
    assert(back.sampleRate == 16000 && back.channels == 2)
    assert(back.samples.toSeq == p.samples.toSeq)
    assert(back.nFrames == 4)
  }

  test("chunk traversal skips unknown chunks and honors word alignment") {
    val p = Pcm(8000, 1, Array[Short](5, -5, 6))
    val canonical = encodeWav(p)
    // splice an odd-sized LIST chunk between WAVE and fmt: traversal must
    // skip its pad byte to land on fmt
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3) ++ Array[Byte](0) // size 3 + pad
    val riffBody = canonical.drop(12)
    val total = 4 + listChunk.length + riffBody.length
    val hacked = java.nio.ByteBuffer.allocate(8 + total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(total)
      .put("WAVE".getBytes("US-ASCII")).put(listChunk).put(riffBody).array()
    val back = decodeWav(hacked).get
    assert(back.samples.toSeq == p.samples.toSeq)
  }

  test("8-bit unsigned PCM widens exactly: (b - 128) << 8") {
    val p = Pcm(8000, 1, Array[Short](1, 2))
    val bytes = encodeWav(p)
    // rewrite header to 8-bit and data to two unsigned bytes 128 (=0) and 255
    val b = bytes.clone()
    b(34) = 8 // bits per sample
    val fixed = b.take(40) ++ Array[Byte](2, 0, 0, 0) ++
      Array[Byte](128.toByte, 255.toByte)
    val back = decodeWav(fixed).get
    assert(back.samples.toSeq == Seq[Short](0, ((255 - 128) << 8).toShort))
  }

  test("rejects: float@16bit, int@12bit, truncated data, garbage — all None") {
    val good = encodeWav(Pcm(8000, 1, Array[Short](1, 2, 3)))
    // float is only legal at 32/64 bits; the header says 16 — reject
    val floatFmt = good.clone(); floatFmt(20) = 3
    assert(decodeWav(floatFmt).isEmpty)
    val b12 = good.clone(); b12(34) = 12 // no 12-bit PCM
    assert(decodeWav(b12).isEmpty)
    assert(decodeWav(good.dropRight(1)).isEmpty, "truncated data chunk")
    assert(decodeWav("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty, "no chunks")
    assert(decodeWav(Array[Byte](1, 2, 3)).isEmpty)
  }

  /** Hand-assembled WAV with an arbitrary fmt (plain or EXTENSIBLE). */
  private def wav(fmtTag: Int, channels: Int, rate: Int, bits: Int,
      data: Array[Byte], subFormat: Int = 0): Array[Byte] = {
    val ext = fmtTag == 0xfffe
    val fmtSize = if (ext) 40 else 16
    val pad = data.length & 1
    val buf = java.nio.ByteBuffer.allocate(12 + 8 + fmtSize + 8 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + fmtSize + 8 + data.length + pad)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(fmtSize)
      .putShort(fmtTag.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * bits / 8).putShort((channels * bits / 8).toShort)
      .putShort(bits.toShort)
    if (ext) {
      buf.putShort(22).putShort(bits.toShort).putInt(0x3) // cbSize, validBits, mask
      buf.putShort(subFormat.toShort) // GUID word 0 = the real format code
      buf.put(Array[Byte](0, 0, 0, 0, 0x10, 0, 0x80.toByte, 0, 0,
        0xaa.toByte, 0, 0x38, 0x9b.toByte, 0x71)) // KSDATAFORMAT remainder
    }
    buf.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    if (pad == 1) buf.put(0.toByte)
    buf.array()
  }

  test("24/32-bit integer PCM narrows to the high 16 bits, sign-exact") {
    // 24-bit LE samples 0x018000 (-> 384) and 0xFF0000 (-> -256)
    val d24 = Array[Byte](0x00, 0x80.toByte, 0x01, 0x00, 0x00, 0xFF.toByte)
    assert(decodeWav(wav(1, 1, 8000, 24, d24)).get.samples.toSeq ==
      Seq[Short](384, -256))
    val d32 = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(0x7FFF0000).putInt(0x80000000).array()
    assert(decodeWav(wav(1, 1, 8000, 32, d32)).get.samples.toSeq ==
      Seq[Short](32767, -32768))
  }

  test("IEEE float 32/64 scales by 32768, clamps to int16, NaN -> silence") {
    val d32 = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putFloat(0.5f).putFloat(1.0f).putFloat(-1.0f).putFloat(Float.NaN).array()
    assert(decodeWav(wav(3, 1, 8000, 32, d32)).get.samples.toSeq ==
      Seq[Short](16384, 32767, -32768, 0))
    val d64 = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putDouble(0.25).putDouble(-0.5).array()
    assert(decodeWav(wav(3, 1, 8000, 64, d64)).get.samples.toSeq ==
      Seq[Short](8192, -16384))
  }

  test("WAVE_FORMAT_EXTENSIBLE resolves the SubFormat code (PCM and float)") {
    val data = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(123).putShort(-77).array()
    assert(decodeWav(wav(0xfffe, 1, 44100, 16, data, subFormat = 1))
      .get.samples.toSeq == Seq[Short](123, -77))
    val fd = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putFloat(0.5f).array()
    assert(decodeWav(wav(0xfffe, 1, 44100, 32, fd, subFormat = 3))
      .get.samples.toSeq == Seq[Short](16384))
    // an extensible wrapper naming an unknown sub-code still rejects
    assert(decodeWav(wav(0xfffe, 1, 44100, 16, data, subFormat = 7)).isEmpty)
  }

  test("G.711 expansion: classic anchors, monotone segments, format 6/7 RIFF decode") {
    import WavCodec.{ulaw2linear, alaw2linear}
    // μ-law anchors from the CCITT table: 0xff/0x7f are the two zeros,
    // 0x00 is the negative extreme -32124, 0x80 the positive +32124
    assert(ulaw2linear(0xff) == 0 && ulaw2linear(0x7f) == 0)
    assert(ulaw2linear(0x00) == -32124 && ulaw2linear(0x80) == 32124)
    assert(ulaw2linear(0xfe) == 8) // smallest positive step
    // A-law anchors: sign bit SET is positive; ±8 nearest zero, ±32256 extremes
    assert(alaw2linear(0xd5) == 8 && alaw2linear(0x55) == -8)
    assert(alaw2linear(0xaa) == 32256 && alaw2linear(0x2a) == -32256)
    // each compander is odd-symmetric: flipping the sign bit negates
    for (c <- 0 until 128) {
      assert(ulaw2linear(c) == -ulaw2linear(c | 0x80))
      assert(alaw2linear(c | 0x80) == -alaw2linear(c))
    }
    // positive μ-law codes decode monotonically decreasing as the code
    // rises toward 0xff (larger code = smaller magnitude after complement)
    val uPos = (0x80 to 0xff).map(ulaw2linear(_).toInt)
    assert(uPos.zip(uPos.tail).forall { case (a, b) => a > b })
    // RIFF legs: format 7 / format 6 streams decode through the walk
    val codes = Array.tabulate(64)(k => (k * 4 + 1).toByte)
    val pu = decodeWav(wavContainer(8000, 1, 8, 7, codes)).get
    assert(pu.samples.toSeq == codes.toSeq.map(c => ulaw2linear(c & 0xff)))
    val pa = decodeWav(wavContainer(8000, 1, 8, 6, codes)).get
    assert(pa.samples.toSeq == codes.toSeq.map(c => alaw2linear(c & 0xff)))
    // G.711 at any bits != 8 rejects
    assert(decodeWav(wavContainer(8000, 1, 16, 7, codes)).isEmpty)
  }

  test("IMA ADPCM: hand-decoded nibble anchors through a packed mono block") {
    // one mono block, blockAlign 12: header (pred=1000, idx=0) + 8 data
    // bytes = 17 samples. First data byte 0x00 (two zero nibbles: step 7
    // gives diff 7>>3 = 0, predictor holds, index clamps at 0), then
    // 0x77: nibble 7 at step 7 -> diff 0+1+3+7 = 11, pred 1011, idx 8;
    // nibble 7 at step 16 -> diff 2+4+8+16 = 30, pred 1041, idx 16.
    val blk = new Array[Byte](12)
    blk(0) = (1000 & 0xff).toByte; blk(1) = (1000 >> 8).toByte
    blk(2) = 0; blk(3) = 0
    blk(4) = 0x00; blk(5) = 0x77
    // remaining bytes 0x00: at idx 16 step 34 -> diff 34>>3 = 4 each
    val riff = java.nio.ByteBuffer.allocate(12 + 28 + 8 + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes).putInt(4 + 28 + 8 + 12).put("WAVE".getBytes)
    riff.put("fmt ".getBytes).putInt(20).putShort(0x11).putShort(1).putInt(8000)
      .putInt(8000 * 12 / 17).putShort(12).putShort(4).putShort(2).putShort(17)
    riff.put("data".getBytes).putInt(12).put(blk)
    val p = decodeWav(riff.array()).get
    assert(p.channels == 1 && p.nFrames == 17)
    assert(p.samples(0) == 1000) // header predictor is frame 0
    assert(p.samples(1) == 1000 && p.samples(2) == 1000) // 0x00 byte
    assert(p.samples(3) == 1011 && p.samples(4) == 1041) // 0x77 byte
    // idx is now 16 (step 34): each zero nibble adds 34>>3 = 4, idx decays
    assert(p.samples(5) == 1045)
  }

  test("IMA ADPCM: encoder round-trip tracks the signal, fact trims, stereo interleaves") {
    // gentle ramp + sine: slope well under the minimum step, so the
    // quantizer stays locked and the reconstruction error stays tiny
    val n = 1203 // not a multiple of samplesPerBlock-1: exercises fact trim
    val mono = Pcm(8000, 1, Array.tabulate[Short](n)(i =>
      (i * 4 + (800 * math.sin(i / 40.0)).toInt).toShort))
    val dec = decodeWav(encodeImaAdpcm(mono, samplesPerBlock = 505)).get
    assert(dec.nFrames == n, "fact chunk must trim the final-block pad")
    val maxErr = mono.samples.zip(dec.samples).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 127, s"ADPCM tracking error $maxErr too large for a gentle signal")
    // stereo: two independent channels survive the word interleave
    val st = Pcm(8000, 2, Array.tabulate[Short](600 * 2) { i =>
      val f = i / 2
      if (i % 2 == 0) (f * 3).toShort else (20000 - f * 5).toShort
    })
    val sdec = decodeWav(encodeImaAdpcm(st, samplesPerBlock = 201)).get
    assert(sdec.channels == 2 && sdec.nFrames == 600)
    val errL = (0 until 600).map(f => math.abs(st.samples(f * 2) - sdec.samples(f * 2))).max
    val errR = (0 until 600).map(f => math.abs(st.samples(f * 2 + 1) - sdec.samples(f * 2 + 1))).max
    assert(errL <= 127 && errR <= 127, s"stereo tracking errors $errL/$errR")
  }

  test("IMA ADPCM rejects: ragged data, bad index, reserved byte, spb mismatch") {
    val good = encodeImaAdpcm(Pcm(8000, 1, Array.tabulate[Short](504)(_.toShort)))
    assert(decodeWav(good).isDefined)
    // data length not a whole number of blocks
    assert(decodeWav(java.util.Arrays.copyOf(good, good.length - 2)).isEmpty)
    // step index > 88 in the block header
    val badIdx = good.clone()
    val dataOff = good.length - 256 // one block of blockAlign 256 at the tail
    badIdx(dataOff + 2) = 89.toByte
    assert(decodeWav(badIdx).isEmpty)
    // non-zero reserved header byte
    val badRes = good.clone(); badRes(dataOff + 3) = 1
    assert(decodeWav(badRes).isEmpty)
    // fmt-extension samplesPerBlock contradicting blockAlign
    val badSpb = good.clone()
    // fmt chunk: "fmt " at 12, samplesPerBlock is the u16 at offset 38
    assert(badSpb(12) == 'f' && badSpb(38) == (505 & 0xff).toByte)
    badSpb(38) = (401 & 0xff).toByte; badSpb(39) = (401 >> 8).toByte
    assert(decodeWav(badSpb).isEmpty)
  }

  test("RMS and peak are exact on known signals; stereo mono-mixes by integer average") {
    // constant half-scale square wave: RMS = peak = 16384 -> 500 milli
    val half = Pcm(8000, 1, Array.fill[Short](800)(16384))
    assert(rmsMilli(half) == 500L && peakMilli(half) == 500L)
    // alternating-sign square wave has the same RMS
    val alt = Pcm(8000, 1, Array.tabulate[Short](800)(i => if (i % 2 == 0) 16384 else -16384))
    assert(rmsMilli(alt) == 500L)
    // stereo (1000, 3000) mono-mixes to 2000 per frame
    val st = Pcm(8000, 2, Array[Short](1000, 3000, 1000, 3000))
    assert(peakMilli(st) == math.round(1000.0 * 2000 / 32768))
    // silence
    assert(rmsMilli(Pcm(8000, 1, Array.fill[Short](100)(0))) == 0L)
    // windowed form: [silent half | loud half]
    val twoPhase = Pcm(1000, 1,
      Array.fill[Short](500)(0) ++ Array.fill[Short](500)(16384))
    assert(rmsMilli(twoPhase, 0, 500) == 0L)
    assert(rmsMilli(twoPhase, 500, 1000) == 500L)
  }

  test("frameEnergies: exact sums, partial-frame drop, stereo mono-mix, contour gain-invariance") {
    import WavCodec.{Pcm, frameEnergies}
    // 2 full frames of 4 + a 3-sample tail that must be DROPPED
    val p = Pcm(8000, 1, Array[Short](1, -2, 3, -4, 10, 10, -10, -10, 99, 99, 99))
    assert(frameEnergies(p, 4).toSeq == Seq(10L, 40L))
    // stereo mono-mixes by integer average before the abs
    val st = Pcm(8000, 2, Array[Short](10, 30, -20, -40, 5, 5, 0, 0))
    assert(frameEnergies(st, 2).toSeq == Seq(20L + 30L, 5L + 0L))
    // contour DIRECTION (the fingerprint bit) survives a 2x gain the
    // absolute energies do not
    val a = Array.tabulate[Short](128)(i => ((i % 37) * 30 - 500).toShort)
    val loud = a.map(v => (v * 2).toShort)
    def dirs(s: Array[Short]) = {
      val e = frameEnergies(Pcm(8000, 1, s), 32)
      e.sliding(2).map { case Array(x, y) => y > x }.toSeq
    }
    assert(dirs(a) == dirs(loud))
  }
}
