package graft.ops

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Pure-JVM codec properties under random rasters (no Spark — these run in
  * milliseconds): PPM encode/decode is an exact round trip, PPM streams
  * round-trip frame-wise, the resize floor mapping is its own spec, and
  * resize to the source dimensions is the identity.
  */
object ImageCodecProps extends Properties("ImageCodec") {
  import ImageCodec._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(sys.env.getOrElse("GRAFT_PROP_N", "200").toInt)

  private val rasters: Gen[Raster] = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 24)
    bytes <- Gen.containerOfN[Array, Byte](w * h * 3, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield Raster(w, h, bytes)

  property("PPM encode -> decode is the identity") = forAllNoShrink(rasters) { r =>
    val back = decodeImage(encodePpm(r)).get
    back.width == r.width && back.height == r.height && back.rgb.sameElements(r.rgb)
  }

  property("PPM streams round-trip frame-wise in order") =
    forAllNoShrink(Gen.nonEmptyListOf(rasters).map(_.take(5))) { frames =>
      val payload = frames.map(encodePpm).reduce(_ ++ _)
      decodePpmStream(payload).exists { got =>
        got.length == frames.length &&
          got.zip(frames).forall { case (a, b) => a.rgb.sameElements(b.rgb) }
      }
    }

  property("resize obeys the exact floor mapping at every output pixel") =
    forAllNoShrink(for {
      r <- rasters
      ow <- Gen.choose(1, 30)
      oh <- Gen.choose(1, 30)
    } yield (r, ow, oh)) { case (r, ow, oh) =>
      val out = resizeNearest(r, ow, oh)
      (0 until oh).forall { y =>
        (0 until ow).forall { x =>
          out.pixel(x, y) == r.pixel(
            (x.toLong * r.width / ow).toInt, (y.toLong * r.height / oh).toInt)
        }
      }
    }

  property("PNG encode -> decode is the identity") = forAllNoShrink(rasters) { r =>
    val back = decodePng(encodePng(r)).get
    back.width == r.width && back.height == r.height && back.rgb.sameElements(r.rgb)
  }

  property("PNG totality: truncated / bit-flipped payloads return None, never throw") =
    forAllNoShrink(for {
      r <- rasters
      cut <- Gen.choose(0, 40)
      flipAt <- Gen.choose(8, 60)
      flipBit <- Gen.choose(0, 7)
    } yield (r, cut, flipAt, flipBit)) { case (r, cut, flipAt, flipBit) =>
      val enc = encodePng(r)
      val truncated = enc.dropRight(math.min(cut, enc.length))
      val flipped = enc.clone()
      if (flipAt < flipped.length)
        flipped(flipAt) = (flipped(flipAt) ^ (1 << flipBit)).toByte
      // outcomes may be None or (for flips in skippable regions) a decode —
      // the contract is only that nothing THROWS
      scala.util.Try(decodePng(truncated)).isSuccess &&
        scala.util.Try(decodePng(flipped)).isSuccess &&
        scala.util.Try(decodeImage(flipped)).isSuccess
    }

  // rasters the GIF encoder accepts (<= 256 distinct colors): quantize
  // each channel to 3 levels so distinct colors <= 27
  private val gifRasters: Gen[Raster] = rasters.map { r =>
    Raster(r.width, r.height, r.rgb.map(b => (((b & 0xff) / 86) * 100).toByte))
  }

  property("GIF encode -> decode is the identity (full LZW path)") =
    forAllNoShrink(gifRasters) { r =>
      val back = decodeGif(encodeGif(r).get).get
      back.width == r.width && back.height == r.height && back.rgb.sameElements(r.rgb)
    }

  property("GIF totality: truncated / bit-flipped payloads never throw") =
    forAllNoShrink(for {
      r <- gifRasters
      cut <- Gen.choose(0, 40)
      flipAt <- Gen.choose(6, 60)
      flipBit <- Gen.choose(0, 7)
    } yield (r, cut, flipAt, flipBit)) { case (r, cut, flipAt, flipBit) =>
      val enc = encodeGif(r).get
      val truncated = enc.dropRight(math.min(cut, enc.length))
      val flipped = enc.clone()
      if (flipAt < flipped.length)
        flipped(flipAt) = (flipped(flipAt) ^ (1 << flipBit)).toByte
      scala.util.Try(decodeGif(truncated)).isSuccess &&
        scala.util.Try(decodeGif(flipped)).isSuccess &&
        scala.util.Try(decodeImage(flipped)).isSuccess
    }

  property("resize to source dims is the identity; truncated payloads never throw") =
    forAllNoShrink(rasters) { r =>
      val same = resizeNearest(r, r.width, r.height)
      val enc = encodePpm(r)
      // any prefix of a valid payload must decode to None or a valid image,
      // never throw (totality — the poison-blob contract)
      val prefixesOk = Seq(0, 1, enc.length / 2, enc.length - 1).forall { k =>
        scala.util.Try(decodeImage(enc.take(k))).isSuccess
      }
      same.rgb.sameElements(r.rgb) && prefixesOk
    }
}
