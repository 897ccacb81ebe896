package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class QoiCodecSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int)(f: Int => (Int, Int, Int)): ImageCodec.Raster = {
    val rgb = new Array[Byte](w * h * 3)
    (0 until w * h).foreach { p =>
      val (r, g, b) = f(p)
      rgb(p * 3) = r.toByte; rgb(p * 3 + 1) = g.toByte; rgb(p * 3 + 2) = b.toByte
    }
    ImageCodec.Raster(w, h, rgb)
  }

  test("round trip: runs, small diffs, luma deltas, big jumps, index hits") {
    val img = raster(37, 11) { p =>
      if (p % 50 < 20) (100, 100, 100)               // long runs
      else if (p % 50 < 30) (100 + p % 2, 100, 99)   // DIFF territory
      else if (p % 50 < 40) (90 + p % 20, 95 + p % 20, 85 + p % 20) // LUMA
      else ((p * 97) % 256, (p * 31) % 256, (p * 13) % 256)         // RGB + INDEX repeats
    }
    val enc = QoiCodec.encodeQoi(img)
    val dec = QoiCodec.decodeQoi(enc).get
    assert(dec.width == 37 && dec.height == 11)
    assert(dec.rgb.toSeq == img.rgb.toSeq)
  }

  test("leading black run RUN-encodes (spec's implicit (0,0,0,255) previous pixel)") {
    // the round-19 fix: p == 0 with pr/pg/pb = (0,0,0) is a legal run
    // start, so a leading run of black pixels compresses to ONE RUN op
    // instead of ten zero-delta DIFF ops
    val img = raster(20, 1)(p => if (p < 10) (0, 0, 0) else (7, 7, 7))
    val enc = QoiCodec.encodeQoi(img)
    assert((enc(14) & 0xff) == (0xc0 | 9), f"first op 0x${enc(14) & 0xff}%02x")
    assert(QoiCodec.decodeQoi(enc).get.rgb.toSeq == img.rgb.toSeq)
  }

  test("encoder actually uses the cheap ops (stream much smaller than 1 RGB op per pixel)") {
    val img = raster(64, 64)(p => (50 + (p / 64) % 3, 50 + (p / 64) % 3, 50))
    val enc = QoiCodec.encodeQoi(img)
    assert(enc.length < 64 * 64, s"flat-ish image should compress, got ${enc.length}")
    assert(QoiCodec.decodeQoi(enc).get.rgb.toSeq == img.rgb.toSeq)
  }

  test("hand-packed stream: known ops decode to known pixels") {
    // 4x1, channels 3: RGB(10,20,30), RUN(2), INDEX(hash slot of the color)
    val slot = (10 * 3 + 20 * 5 + 30 * 7 + 255 * 11) % 64
    val bytes = Array[Int](
      'q', 'o', 'i', 'f', 0, 0, 0, 4, 0, 0, 0, 1, 3, 0,
      0xfe, 10, 20, 30,      // pixel 0
      0xc0 | 1,              // run 2 -> pixels 1,2
      slot,                  // INDEX -> pixel 3 (same color)
      0, 0, 0, 0, 0, 0, 0, 1).map(_.toByte)
    val dec = QoiCodec.decodeQoi(bytes).get
    assert(dec.width == 4 && dec.height == 1)
    assert(dec.rgb.grouped(3).toSeq.forall(px => px.toSeq == Seq(10.toByte, 20.toByte, 30.toByte)))
  }

  test("wrapping DIFF: 255 -> 0 is delta +1") {
    val img = raster(2, 1)(p => if (p == 0) (255, 255, 255) else (0, 0, 0))
    // pixel0 from (0,0,0) prev: delta -1,-1,-1 -> DIFF; pixel1: +1,+1,+1 -> DIFF
    val enc = QoiCodec.encodeQoi(img)
    assert(QoiCodec.decodeQoi(enc).get.rgb.toSeq == img.rgb.toSeq)
    assert(enc.length == 14 + 2 + 8, "both pixels should be single DIFF bytes")
  }

  test("totality: truncation at every byte, bad magic, short stream, run overflow") {
    val img = raster(9, 7)(p => ((p * 7) % 256, (p * 11) % 256, (p * 3) % 256))
    val enc = QoiCodec.encodeQoi(img)
    assert(QoiCodec.decodeQoi(enc).isDefined)
    (1 until enc.length).foreach { n =>
      assert(QoiCodec.decodeQoi(java.util.Arrays.copyOf(enc, n)).isEmpty, s"len $n")
    }
    val badMagic = enc.clone(); badMagic(0) = 'x'
    assert(QoiCodec.decodeQoi(badMagic).isEmpty)
    // run past the pixel count: 1x1 image with RUN 62
    val overrun = Array[Int]('q', 'o', 'i', 'f', 0, 0, 0, 1, 0, 0, 0, 1, 3, 0,
      0xfe, 1, 2, 3, 0xc0 | 61, 0, 0, 0, 0, 0, 0, 0, 1).map(_.toByte)
    assert(QoiCodec.decodeQoi(overrun).isEmpty)
    // bad end marker
    val badEnd = enc.clone(); badEnd(enc.length - 1) = 0
    assert(QoiCodec.decodeQoi(badEnd).isEmpty)
    // fuzz: random buffers never throw
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val buf = new Array[Byte](rnd.nextInt(500))
      rnd.nextBytes(buf)
      QoiCodec.decodeQoi(buf)
      val b2 = enc.clone(); b2(rnd.nextInt(b2.length)) = rnd.nextInt(256).toByte
      QoiCodec.decodeQoi(b2)
    }
  }

  test("decodeImage dispatches QOI payloads") {
    val img = raster(5, 5)(p => (p, p, p))
    assert(ImageCodec.decodeImage(QoiCodec.encodeQoi(img)).get.rgb.toSeq == img.rgb.toSeq)
  }

  test("property: round trip on random images of random sizes") {
    val rnd = new scala.util.Random(13)
    (0 until 30).foreach { _ =>
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      // mixture of flat regions and noise exercises all op classes
      val img = raster(w, h) { p =>
        if (rnd.nextInt(3) == 0) (128, 64, 32)
        else (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))
      }
      val dec = QoiCodec.decodeQoi(QoiCodec.encodeQoi(img)).get
      assert(dec.rgb.toSeq == img.rgb.toSeq, s"${w}x$h")
    }
  }
}
