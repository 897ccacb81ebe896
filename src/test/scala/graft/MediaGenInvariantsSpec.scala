package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DocGen, MediaGen}
import graft.ops.{ImageCodec, WavCodec}

/** The three generator↔codec invariants the `media_datasheet` oracle rests
  * on (TextOps.scala — the symbolic DuckDB twin recomputes decode outcomes
  * from the id domain alone, so these must hold EXACTLY, not statistically):
  *
  *   1. poison ⟺ decode failure, per modality: a payload truncated to 3/5
  *      (mix(3ck+1) % 37 == 0) NEVER decodes — images through
  *      [[ImageCodec.decodeImage]] (all 7 encodings), audio through
  *      [[WavCodec.decodeWav]] (PCM16 and IMA ADPCM), video through the
  *      GIF/PPM-stream dispatch — and a clean payload ALWAYS decodes.
  *   2. clean videos decode to exactly 3 + (mix(ck) & 3) frames (both
  *      containers), so emitted-per-decoded = (frames−1)/3 + 1 at stride 3.
  *   3. distinct content keys never collide in payload bytes, so
  *      count(distinct md5(payload)) = count(distinct ck).
  *
  * Swept to ck < 5000 here (covers the sf0.01 gate domain 2.5×); the r23
  * build session verified the same zero-exception sweep at ck < 20000
  * (the sf0.1 domain). If any of these ever fails, the media_datasheet
  * oracle is the FIRST thing to re-derive.
  */
class MediaGenInvariantsSpec extends AnyFunSuite {

  private val N = 5000L

  test("poison <=> decode failure, exact frame counts, no digest collisions") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.HashMap[String, java.lang.Long]()
    var ck = 0L
    while (ck < N) {
      if (ck % 10 != 9) { // content keys only
        val poison = DocGen.mix(ck * 3 + 1) % 37 == 0
        val payload = MediaGen.payloadOf(ck)
        val (kind, _) = MediaGen.kindOf(ck)
        kind match {
          case "image" =>
            assert(ImageCodec.decodeImage(payload).isDefined == !poison,
              s"image decode/poison disagree at ck=$ck (poison=$poison)")
          case "audio" =>
            assert(WavCodec.decodeWav(payload).isDefined == !poison,
              s"audio decode/poison disagree at ck=$ck (poison=$poison)")
          case "video" =>
            val dec =
              if (ImageCodec.looksLikeGif(payload)) ImageCodec.decodeGifFrames(payload)
              else ImageCodec.decodePpmStream(payload)
            assert(dec.isDefined == !poison,
              s"video decode/poison disagree at ck=$ck (poison=$poison)")
            if (!poison) {
              val expected = 3 + (DocGen.mix(ck) & 3).toInt
              assert(dec.get.length == expected,
                s"video ck=$ck decoded ${dec.get.length} frames, generator says $expected")
            }
        }
        val fp = java.util.Base64.getEncoder.encodeToString(md.digest(payload))
        val prev = seen.put(fp, java.lang.Long.valueOf(ck))
        assert(prev == null, s"payload digest collision: ck=$ck vs $prev")
      }
      ck += 1
    }
    assert(seen.size == (N - N / 10), "unique content count off")
  }
}
