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

  test("rejects: float format, 24-bit, truncated data, garbage — all None") {
    val good = encodeWav(Pcm(8000, 1, Array[Short](1, 2, 3)))
    val floatFmt = good.clone(); floatFmt(20) = 3 // audioFormat = IEEE float
    assert(decodeWav(floatFmt).isEmpty)
    val b24 = good.clone(); b24(34) = 24
    assert(decodeWav(b24).isEmpty)
    assert(decodeWav(good.dropRight(1)).isEmpty, "truncated data chunk")
    assert(decodeWav("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty, "no chunks")
    assert(decodeWav(Array[Byte](1, 2, 3)).isEmpty)
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
}
