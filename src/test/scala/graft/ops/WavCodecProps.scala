package graft.ops

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** WAV codec properties under random PCM (pure JVM, no Spark): encode /
  * decode identity, statistic bounds, window-vs-whole RMS consistency, and
  * decode totality on truncated payloads.
  */
object WavCodecProps extends Properties("WavCodec") {
  import WavCodec._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(sys.env.getOrElse("GRAFT_PROP_N", "200").toInt)

  private val pcms: Gen[Pcm] = for {
    rate <- Gen.oneOf(8000, 16000, 44100)
    ch <- Gen.choose(1, 3)
    frames <- Gen.choose(1, 200)
    samples <- Gen.containerOfN[Array, Short](frames * ch,
      Gen.choose(Short.MinValue, Short.MaxValue))
  } yield Pcm(rate, ch, samples)

  property("encode -> decode is the identity") = forAllNoShrink(pcms) { p =>
    val back = decodeWav(encodeWav(p)).get
    back.sampleRate == p.sampleRate && back.channels == p.channels &&
      back.samples.sameElements(p.samples)
  }

  property("RMS and peak stay in [0, 1000] and RMS <= peak") =
    forAllNoShrink(pcms) { p =>
      val r = rmsMilli(p); val pk = peakMilli(p)
      0L <= r && r <= 1000L && 0L <= pk && pk <= 1000L && r <= pk
    }

  property("whole-clip mean square equals the frame-count-weighted window mean square") =
    forAllNoShrink(pcms.map(p => (p, 1 + p.nFrames / 3))) { case (p, win) =>
      // windows partition the frames, so Σ win_i (rms_i/1000·FS)²·n_i over n
      // must reconstruct the whole-clip mean square up to rounding of the
      // milli quantization; bound the drift accordingly
      val whole = rmsMilli(p)
      val nWins = (p.nFrames + win - 1) / win
      val parts = (0 until nWins).map { w =>
        val from = w * win; val until = math.min(p.nFrames, (w + 1) * win)
        (rmsMilli(p, from, until), until - from)
      }
      val fs = 32768.0
      val recon = math.sqrt(parts.map { case (r, n) =>
        val amp = r / 1000.0 * fs; amp * amp * n
      }.sum / p.nFrames) / fs * 1000.0
      math.abs(recon - whole) <= 2.0 // milli-quantization drift bound
    }

  property("truncated payloads never throw") = forAllNoShrink(
    pcms.flatMap(p => Gen.choose(0, 44 + p.samples.length * 2).map(k => (p, k)))) {
    case (p, k) =>
      scala.util.Try(decodeWav(encodeWav(p).take(k))).isSuccess
  }
}
