package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class MimeOpsSpec extends AnyFunSuite {

  test("quoted-printable anchors: escapes, soft breaks, case tolerance, literals") {
    assert(MimeOps.decodeQp("A=42C").get.toSeq == "ABC".getBytes.toSeq)
    assert(MimeOps.decodeQp("A=\r\nB").get.toSeq == "AB".getBytes.toSeq) // CRLF soft break
    assert(MimeOps.decodeQp("A=\nB").get.toSeq == "AB".getBytes.toSeq) // tolerated bare LF
    assert(MimeOps.decodeQp("=e9").get.toSeq == Seq(0xe9.toByte)) // lowercase hex
    assert(MimeOps.decodeQp("=3D").get.toSeq == "=".getBytes.toSeq)
    assert(MimeOps.decodeQp("a b").get.toSeq == "a b".getBytes.toSeq)
    // malformed: dangling '=', non-hex escape
    assert(MimeOps.decodeQp("AB=").isEmpty)
    assert(MimeOps.decodeQp("=G1").isEmpty)
    assert(MimeOps.decodeQp("=4").isEmpty)
  }

  test("encode -> decode round-trips every byte value; lines stay <= 76 chars") {
    val all = Array.tabulate[Byte](256)(_.toByte)
    val enc = MimeOps.encodeQp(all)
    assert(MimeOps.decodeQp(enc).get.toSeq == all.toSeq)
    for (line <- enc.split("\r\n"))
      assert(line.length <= 76, s"line too long: ${line.length}")
    // '=' always escapes; a run of escapes still breaks correctly
    val eqs = Array.fill[Byte](100)('='.toByte)
    val enc2 = MimeOps.encodeQp(eqs)
    assert(MimeOps.decodeQp(enc2).get.toSeq == eqs.toSeq)
    assert(enc2.split("\r\n").forall(_.length <= 76))
  }

  test("totality fuzz: random strings never throw") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 300) {
      val s = new String(Array.fill(rnd.nextInt(64))((rnd.nextInt(96) + 32).toChar))
      MimeOps.decodeQp(s) // Some or None, never a throw
      ()
    }
  }
}
