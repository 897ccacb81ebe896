package graft.ops

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Totality and invariants for the baseline JPEG codec under adversarial
  * and random inputs (no Spark — milliseconds): decode never throws on
  * arbitrary bytes, random rasters of any size round-trip to the exact
  * dimensions, truncated real payloads are always rejected, and decode is
  * a pure function (identical bytes out for identical bytes in).
  */
object JpegCodecProps extends Properties("JpegCodec") {
  import ImageCodec.Raster

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(sys.env.getOrElse("GRAFT_PROP_N", "200").toInt)

  private val rasters: Gen[Raster] = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 24)
    bytes <- Gen.containerOfN[Array, Byte](w * h * 3, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield Raster(w, h, bytes)

  property("decode is TOTAL on arbitrary magic-prefixed garbage") =
    forAllNoShrink(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { tail =>
      val b = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ tail
      JpegCodec.decode(b) // must not throw; any Option is acceptable
      true
    }

  property("random rasters round-trip to exact dimensions (444 and 420)") =
    forAllNoShrink(for { r <- rasters; s <- Gen.oneOf(true, false) } yield (r, s)) {
      case (r, sub) =>
        JpegCodec.decode(JpegCodec.encode(r, quality = 85, subsample420 = sub))
          .exists(d => d.width == r.width && d.height == r.height)
    }

  property("truncated payloads are rejected (strict totality)") =
    forAllNoShrink(for {
      r <- rasters
      cut <- Gen.choose(0.1, 0.95)
    } yield (r, cut)) { case (r, cut) =>
      val whole = JpegCodec.encode(r, quality = 85)
      val take = math.min(whole.length - 3, (whole.length * cut).toInt)
      JpegCodec.decode(whole.take(take)).isEmpty
    }

  property("decode is a pure function: same payload -> same pixels") =
    forAllNoShrink(rasters) { r =>
      val payload = JpegCodec.encode(r, quality = 70, subsample420 = true)
      val a = JpegCodec.decode(payload)
      val b = JpegCodec.decode(payload)
      a.isDefined && b.isDefined && a.get.rgb.sameElements(b.get.rgb)
    }
}
