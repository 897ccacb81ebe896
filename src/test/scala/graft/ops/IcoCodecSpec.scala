package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class IcoCodecSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int)(f: (Int, Int) => Int): ImageCodec.Raster = {
    val rgb = new Array[Byte](w * h * 3)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val v = f(x, y)
        val d = (y * w + x) * 3
        rgb(d) = v.toByte; rgb(d + 1) = v.toByte; rgb(d + 2) = v.toByte
      }
    }
    ImageCodec.Raster(w, h, rgb)
  }

  test("bmp member round trip: bottom-up rows, stride padding, BGR order") {
    // w=5 -> 15-byte rows need 1 pad byte; asymmetric pattern catches flips
    val img = raster(5, 3)((x, y) => 10 * y + x)
    val ico = IcoCodec.buildIco(Seq(img)).get
    val dec = IcoCodec.decodeIco(ico).get
    assert(dec.length == 1)
    assert(dec(0).width == 5 && dec(0).height == 3)
    assert(dec(0).rgb.toSeq == img.rgb.toSeq)
  }

  test("AND mask composites masked pixels to black") {
    val img = raster(8, 8)((_, _) => 200)
    val ico = IcoCodec.buildIco(Seq(img), masked = (_, x, y) => (x + y) % 3 == 0).get
    val dec = IcoCodec.decodeIco(ico).get.head
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        val d = (y * 8 + x) * 3
        val want = if ((x + y) % 3 == 0) 0 else 200
        assert((dec.rgb(d) & 0xff) == want, s"($x,$y)")
      }
    }
  }

  test("png members and mixed directories decode; member order preserved") {
    val a = raster(4, 4)((x, y) => 50 + x + y)
    val b = raster(6, 2)((x, y) => 100 + 2 * x + 3 * y)
    val c = raster(3, 5)((x, y) => 5 * x + 7 * y)
    val ico = IcoCodec.buildIco(Seq(a, b, c), asPng = k => k == 1).get
    val dec = IcoCodec.decodeIco(ico).get
    assert(dec.length == 3)
    assert(dec(0).rgb.toSeq == a.rgb.toSeq)
    assert(dec(1).rgb.toSeq == b.rgb.toSeq, "the PNG member")
    assert(dec(2).rgb.toSeq == c.rgb.toSeq)
  }

  test("hand-packed 32bpp and 8bpp palette members decode") {
    // 32bpp: 2x1, pixels (r,g,b,a) = (1,2,3,255),(4,5,6,255); mask 0
    def w32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def w16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val hdr32 = w32(40) ++ w32(2) ++ w32(2) ++ w16(1) ++ w16(32) ++ w32(0) ++
      w32(0) ++ w32(0) ++ w32(0) ++ w32(0) ++ w32(0)
    val xor32 = Array[Byte](3, 2, 1, -1, 6, 5, 4, -1) // BGRA, one row (the bottom = only row)
    val and32 = new Array[Byte](4)
    val m32 = hdr32 ++ xor32 ++ and32
    // 8bpp: 2x1, palette[0]=(9,8,7), palette[1]=(30,20,10); indexes 1,0
    val hdr8 = w32(40) ++ w32(2) ++ w32(2) ++ w16(1) ++ w16(8) ++ w32(0) ++
      w32(0) ++ w32(0) ++ w32(0) ++ w32(2) ++ w32(0)
    val pal = Array[Byte](7, 8, 9, 0, 10, 20, 30, 0) // BGRX
    val xor8 = Array[Byte](1, 0, 0, 0) // padded to 4
    val and8 = new Array[Byte](4)
    val m8 = hdr8 ++ pal ++ xor8 ++ and8
    val dir = Array[Byte](0, 0, 1, 0, 2, 0) ++
      (Array[Byte](2, 1, 0, 0, 1, 0, 32, 0) ++ w32(m32.length) ++ w32(6 + 32)) ++
      (Array[Byte](2, 1, 0, 0, 1, 0, 8, 0) ++ w32(m8.length) ++ w32(6 + 32 + m32.length))
    val dec = IcoCodec.decodeIco(dir ++ m32 ++ m8).get
    assert(dec(0).rgb.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    assert(dec(1).rgb.toSeq == Seq[Byte](30, 20, 10, 9, 8, 7))
  }

  test("totality: truncation, bad dims, overlapping offsets, unsupported depth reject") {
    val ico = IcoCodec.buildIco(Seq(raster(4, 4)((x, y) => x * y))).get
    assert(IcoCodec.decodeIco(ico).isDefined)
    (1 until ico.length by 3).foreach { n =>
      assert(IcoCodec.decodeIco(java.util.Arrays.copyOf(ico, n)).isEmpty, s"len $n")
    }
    // odd doubled height rejects
    val oddH = ico.clone(); oddH(6 + 16 + 8) = 3 // biHeight = 3 (odd)
    assert(IcoCodec.decodeIco(oddH).isEmpty)
    // entry offset pointing past the end rejects
    val badOff = ico.clone(); badOff(6 + 12) = 0x7f
    assert(IcoCodec.decodeIco(badOff).isEmpty)
    // 16bpp member depth rejects
    val bpp16 = ico.clone(); bpp16(6 + 16 + 14) = 16
    assert(IcoCodec.decodeIco(bpp16).isEmpty)
    assert(IcoCodec.decodeIco(Array.emptyByteArray).isEmpty)
    // fuzz
    val rnd = new scala.util.Random(3)
    (0 until 200).foreach { _ =>
      val buf = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(buf)
      IcoCodec.decodeIco(buf)
      val b2 = ico.clone(); b2(rnd.nextInt(b2.length)) = rnd.nextInt(256).toByte
      IcoCodec.decodeIco(b2)
    }
  }

  test("oversized members are refused by the writer (ICO caps at 256)") {
    assert(IcoCodec.buildIco(Seq(raster(300, 4)((_, _) => 0))).isEmpty)
  }
}
