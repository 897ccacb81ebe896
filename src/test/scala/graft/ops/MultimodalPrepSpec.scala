package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end media prep on a crafted mixed corpus: exact content dedup
  * across kinds, every modality kernel computing on real bytes, and a
  * datasheet whose numbers reconcile exactly with the branches.
  */
class MultimodalPrepSpec extends AnyFunSuite with SparkSpec {

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  private def ppm(w: Int, h: Int, v: Int): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ Array.fill(w * h * 3)(v.toByte)

  test("prepare dedups content, runs every real kernel, and the datasheet reconciles") {
    import spark.implicits._
    val bigImage = ppm(8, 4, 9) // long side 8 > maxDim 4 -> downsized to 4x2
    val dupImage = ppm(8, 4, 9) // same bytes, different envelope -> deduped
    val smallImage = ppm(2, 2, 5)
    val clip = WavCodec.encodeWav(WavCodec.Pcm(1000, 1,
      Array.fill[Short](200)(0) ++ Array.fill[Short](300)(16384))) // trims to [200,500)
    val vid = ppm(2, 1, 1) ++ ppm(2, 1, 2) ++ ppm(2, 1, 1) // frames 0,1,2; stride 2 -> 0,2
    val env = spark.createDataset(Seq(
      MultimodalOps.MediaEnvelope(1L, "image", bigImage, "x"),
      MultimodalOps.MediaEnvelope(2L, "image", dupImage, "x"),
      MultimodalOps.MediaEnvelope(3L, "image", smallImage, "x"),
      MultimodalOps.MediaEnvelope(4L, "audio", clip, "x"),
      MultimodalOps.MediaEnvelope(5L, "video", vid, "x"))).repartition(3)

    val r = MultimodalPrep.prepare(env, maxDim = 4, silenceThresholdMilli = 10, frameStride = 2)

    // dedup: envelope 2 collapses into 1 (same bytes, smaller id wins)
    assert(r.unique.collect().map(_.media_id).toSet == Set(1L, 3L, 4L, 5L))

    // image branch: real resample — 8x4 at maxDim 4 -> 4x2, small untouched
    val imgs = r.images.collect().map(i => i.media_id -> i).toMap
    assert(imgs.keySet == Set(1L, 3L))
    assert((imgs(1L).out_w, imgs(1L).out_h) == ((4, 2)))
    assert(imgs(1L).out_fp == md5hex(ppm(4, 2, 9)), "downsized pixels are exact")
    assert((imgs(3L).out_w, imgs(3L).out_h) == ((2, 2)))

    // audio branch: real trim — 200 ms silence then 300 ms half-scale
    val aud = r.audio.collect()
    assert(aud.length == 1 && aud.head.media_id == 4L)
    assert(aud.head.start_ms == 200L && aud.head.end_ms == 500L && aud.head.kept_ms == 300L)

    // video branch: stride-2 real frames; frames 0 and 2 are the SAME
    // content -> same fingerprint (position-free dedup key)
    val fs = r.frames.collect().sortBy(_.frame_idx)
    assert(fs.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(fs.head.frame_fp == md5hex(ppm(2, 1, 1)))
    assert(fs.head.frame_fp == fs.last.frame_fp)

    // datasheet reconciles exactly with the branches
    val sheet = r.datasheet.collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(sheet == Map(
      "image" -> ((3L, 2L, 2L)),   // 3 in, 2 unique, 2 resized rows
      "audio" -> ((1L, 1L, 1L)),
      "video" -> ((1L, 1L, 2L)))) // 1 video emits 2 sampled frames
  }
}
