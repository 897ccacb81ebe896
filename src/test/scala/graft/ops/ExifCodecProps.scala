package graft.ops

import org.scalacheck.{Gen, Properties, Prop}
import org.scalacheck.Prop.forAllNoShrink
import org.scalacheck.Test.Parameters

/** Property pin for the EXIF builder/parser pair: every representable
  * field combination round-trips exactly through BOTH byte orders, and
  * random corruption never makes the parser throw or fabricate fields
  * (None, or the still-intact truth).
  */
object ExifCodecProps extends Properties("ExifCodec") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(sys.env.getOrElse("GRAFT_PROP_N", "200").toInt)

  private val jpeg: Array[Byte] =
    JpegCodec.encode(ImageCodec.Raster(16, 9, Array.fill(16 * 9 * 3)(120.toByte)), quality = 74)

  private val genFields = for {
    le <- Gen.oneOf(true, false)
    ori <- Gen.choose(1, 8)
    xn <- Gen.choose(1L, 0xffffffffL) // full unsigned-32 RATIONAL numerator
    xd <- Gen.choose(1L, 0xffffffffL)
    iso <- Gen.choose(0, 65535) // SHORT domain
    px <- Gen.choose(0L, 0xffffffffL) // LONG domain
    dt <- Gen.listOfN(19, Gen.oneOf(('0' to '9') ++ Seq(':', ' '))).map(_.mkString)
  } yield (le, ori, xn, xd, iso, px, dt)

  property("round trip: every field, both byte orders, full value domains") =
    forAllNoShrink(genFields) { case (le, ori, xn, xd, iso, px, dt) =>
      val app1 = ExifCodec.buildApp1(le, ori, xn, xd, dt, iso, px)
      val tagged = ExifCodec.spliceApp1(jpeg, app1).get
      ExifCodec.parseExif(tagged).exists { ex =>
        ex.byteOrder == (if (le) "II" else "MM") && ex.orientation == ori &&
          ex.xresNum == xn && ex.xresDen == xd && ex.dateTime == dt &&
          ex.iso == iso && ex.pixelX == px
      }
    }

  property("single-byte corruption never throws; truncation never throws") =
    forAllNoShrink(genFields, Gen.choose(0, 10000), Gen.choose(0, 255)) {
      case ((le, ori, xn, xd, iso, px, dt), posSeed, b) =>
        val tagged = ExifCodec.spliceApp1(jpeg,
          ExifCodec.buildApp1(le, ori, xn, xd, dt, iso, px)).get
        val mut = tagged.clone()
        mut(posSeed % mut.length) = b.toByte
        val _ = ExifCodec.parseExif(mut) // must be total: Some or None, no throw
        val cut = java.util.Arrays.copyOf(tagged, posSeed % tagged.length)
        val __ = ExifCodec.parseExif(cut)
        Prop.passed
    }
}
