package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ArchiveOpsSpec extends AnyFunSuite with SparkSpec {

  private def payload(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed + i * 31) % 256).toByte)

  // ------------------------------------------------------------------ ZIP

  test("zip: build -> parse round trip, stored and deflated members, CRC verified") {
    val es = Seq(
      ("a/one.txt", payload(100, 1), false),
      ("a/two.bin", payload(5000, 2), true), // compressible-ish
      ("empty", Array.emptyByteArray, false),
      ("three.txt", "hello world hello world hello world".getBytes("UTF-8"), true))
    val zip = ArchiveOps.buildZip(es)
    val ms = ArchiveOps.parseZip(zip).get
    assert(ms.length == 4)
    es.zip(ms).foreach { case ((name, data, deflate), m) =>
      assert(m.name == name)
      assert(m.method == (if (deflate) 8 else 0))
      assert(m.uncompSize == data.length)
      assert(m.data.toSeq == data.toSeq)
    }
    // deflated member actually compressed the repetitive payload
    assert(ms(3).compSize < ms(3).uncompSize)
  }

  test("zip: the JDK's ZipInputStream reads our archives (cross-implementation, write side)") {
    val es = Seq(("x.txt", payload(200, 5), true), ("y.txt", payload(64, 9), false))
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(ArchiveOps.buildZip(es)))
    es.foreach { case (name, data, _) =>
      val e = zin.getNextEntry
      assert(e.getName == name)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      var n = zin.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = zin.read(buf) }
      assert(out.toByteArray.toSeq == data.toSeq)
    }
    assert(zin.getNextEntry == null)
  }

  test("zip: we read the JDK's ZipOutputStream archives (cross-implementation, read side)") {
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    val d1 = payload(300, 3); val d2 = payload(40, 7)
    zout.putNextEntry(new java.util.zip.ZipEntry("jdk/a.bin")); zout.write(d1); zout.closeEntry()
    val stored = new java.util.zip.ZipEntry("jdk/b.bin")
    stored.setMethod(java.util.zip.ZipOutputStream.STORED)
    stored.setSize(d2.length)
    val c = new java.util.zip.CRC32(); c.update(d2); stored.setCrc(c.getValue)
    zout.putNextEntry(stored); zout.write(d2); zout.closeEntry()
    zout.close()
    // JDK writes DEFLATED members with the data-descriptor convention
    // (local header sizes zero, flag bit 3) — the central-directory walk
    // must still read them
    val ms = ArchiveOps.parseZip(bos.toByteArray).get
    assert(ms.map(_.name) == Vector("jdk/a.bin", "jdk/b.bin"))
    assert(ms(0).data.toSeq == d1.toSeq && ms(1).data.toSeq == d2.toSeq)
  }

  test("zip: totality — truncation, flipped CRC, garbage, encryption flag all reject") {
    val zip = ArchiveOps.buildZip(Seq(("f", payload(100, 11), true)))
    assert(ArchiveOps.parseZip(zip).isDefined)
    // truncation at every eighth byte boundary
    (1 until zip.length by 8).foreach { n =>
      assert(ArchiveOps.parseZip(java.util.Arrays.copyOf(zip, n)).isEmpty, s"len $n")
    }
    // flip a payload byte -> CRC mismatch
    val bad = zip.clone(); bad(35) = (bad(35) ^ 0x55).toByte
    assert(ArchiveOps.parseZip(bad).isEmpty)
    assert(ArchiveOps.parseZip(Array.emptyByteArray).isEmpty)
    assert(ArchiveOps.parseZip(payload(300, 17)).isEmpty)
    // zip-bomb bound: a member larger than the budget rejects
    assert(ArchiveOps.parseZip(
      ArchiveOps.buildZip(Seq(("big", new Array[Byte](1 << 16), true))), maxBytes = 1 << 10).isEmpty)
  }

  // ------------------------------------------------------------------ TAR

  test("tar: build -> parse round trip, padding and terminator exact") {
    val es = Seq(
      ("d/one.txt", payload(512, 1)), // exactly one block
      ("d/two.txt", payload(513, 2)), // spills into a second block
      ("d/three", Array.emptyByteArray),
      ("four.bin", payload(100, 3)))
    val tar = ArchiveOps.buildTar(es)
    assert(tar.length % 512 == 0)
    // block arithmetic: 2 terminator + per member 1 header + ceil(size/512)
    val expectBlocks = 2 + es.map { case (_, d) => 1 + (d.length + 511) / 512 }.sum
    assert(tar.length / 512 == expectBlocks)
    val ms = ArchiveOps.parseTar(tar).get
    assert(ms.length == 4)
    es.zip(ms).foreach { case ((name, data), m) =>
      assert(m.name == name && m.size == data.length)
      assert(m.data.toSeq == data.toSeq)
    }
  }

  test("tar: GNU-magic headers parse; checksum and framing violations reject") {
    val tar = ArchiveOps.buildTar(Seq(("a", payload(100, 5))))
    // rewrite POSIX magic+version to old-GNU "ustar  \0"
    val gnu = tar.clone()
    System.arraycopy("ustar  ".getBytes("US-ASCII"), 0, gnu, 257, 7)
    gnu(264) = 0
    // fix checksum for the edited header
    java.util.Arrays.fill(gnu, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += (gnu(i) & 0xffL))
    val cs = java.lang.Long.toOctalString(sum)
    ("0" * (6 - cs.length) + cs).getBytes("US-ASCII").zipWithIndex
      .foreach { case (b, i) => gnu(148 + i) = b }
    gnu(154) = 0; gnu(155) = ' '
    assert(ArchiveOps.parseTar(gnu).isDefined, "old-GNU magic must parse")

    // corrupt checksum rejects
    val badCs = tar.clone(); badCs(148) = '7'
    assert(ArchiveOps.parseTar(badCs).isEmpty)
    // bad magic rejects
    val badMagic = tar.clone(); badMagic(257) = 'X'
    assert(ArchiveOps.parseTar(badMagic).isEmpty)
    // non-octal size rejects (checksum would also mismatch — both fatal)
    val badSize = tar.clone(); badSize(124) = '9'
    assert(ArchiveOps.parseTar(badSize).isEmpty)
    // truncation: missing terminator / partial blocks reject
    assert(ArchiveOps.parseTar(java.util.Arrays.copyOf(tar, tar.length - 512)).isEmpty)
    assert(ArchiveOps.parseTar(java.util.Arrays.copyOf(tar, 700)).isEmpty)
    assert(ArchiveOps.parseTar(Array.emptyByteArray).isEmpty)
    assert(ArchiveOps.parseTar(new Array[Byte](1024) /* bare terminator */).isEmpty)
  }

  test("tar: GNU/pax name-extension typeflags (L/K/x/g) reject, not misread") {
    // their payloads REWRITE the following member's name; reporting them
    // as opaque members (e.g. '././@LongLink') would misreport names —
    // the round-19 fix makes them a framing rejection
    for (tf <- Seq('L', 'K', 'x', 'g')) {
      val t = ArchiveOps.buildTar(Seq(("a", payload(100, 5)))).clone()
      t(156) = tf.toByte
      // re-checksum the edited header so the typeflag guard (not the
      // checksum guard) is what fires
      java.util.Arrays.fill(t, 148, 156, ' '.toByte)
      var sum = 0L
      (0 until 512).foreach(i => sum += (t(i) & 0xffL))
      val cs = java.lang.Long.toOctalString(sum)
      ("0" * (6 - cs.length) + cs).getBytes("US-ASCII").zipWithIndex
        .foreach { case (b, i) => t(148 + i) = b }
      t(154) = 0; t(155) = ' '
      assert(ArchiveOps.parseTar(t).isEmpty, s"typeflag $tf must reject")
    }
  }

  test("tar: directory members ride along without data; .tar.gz leg parses identically") {
    // hand-edit a member into a directory (typeflag '5', size 0)
    val tar = ArchiveOps.buildTar(Seq(("d/", Array.emptyByteArray), ("d/f", payload(60, 8))))
    val dir = tar.clone(); dir(156) = '5'
    // re-checksum first header
    java.util.Arrays.fill(dir, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += (dir(i) & 0xffL))
    val cs = java.lang.Long.toOctalString(sum)
    ("0" * (6 - cs.length) + cs).getBytes("US-ASCII").zipWithIndex
      .foreach { case (b, i) => dir(148 + i) = b }
    dir(154) = 0; dir(155) = ' '
    val ms = ArchiveOps.parseTar(dir).get
    assert(ms.length == 2 && ms(0).typeflag == '5' && ms(0).data.isEmpty)
    assert(ms(1).name == "d/f" && ms(1).size == 60)

    val gz = WarcOps.gzipMember(tar)
    val gzMs = ArchiveOps.parseTarGz(gz).get
    assert(gzMs.map(m => (m.name, m.size)) == ArchiveOps.parseTar(tar).get.map(m => (m.name, m.size)))
    // gz-level corruption rejects
    val badGz = gz.clone(); badGz(gz.length / 2) = (badGz(gz.length / 2) ^ 0x7f).toByte
    assert(ArchiveOps.parseTarGz(badGz).isEmpty)
  }

  test("tar: the system tar reads our archives if available (cross-implementation)") {
    val es = Seq(("x/a.txt", payload(100, 21)), ("x/b.txt", payload(777, 22)))
    val tar = ArchiveOps.buildTar(es)
    val tmp = java.nio.file.Files.createTempFile("graft-tar", ".tar")
    try {
      java.nio.file.Files.write(tmp, tar)
      val pb = new ProcessBuilder("tar", "-tf", tmp.toString)
      pb.redirectErrorStream(true)
      val proc =
        try Some(pb.start())
        catch { case _: java.io.IOException => None } // no tar binary: skip
      proc.foreach { p =>
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        assert(p.waitFor() == 0, s"tar -tf failed: $out")
        assert(out.linesIterator.toSeq.sorted == es.map(_._1).sorted)
      }
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  // ------------------------------------------------------ frame explode

  test("zipMembers/tarMembers: member rows per file, poison archives surface parsed=false") {
    val s = spark
    import s.implicits._
    val goodZip = ArchiveOps.buildZip(Seq(("m0", payload(10, 1), false), ("m1", payload(20, 2), true)))
    val goodTar = ArchiveOps.buildTar(Seq(("t0", payload(10, 3))))
    val zdf = Seq((0L, goodZip), (1L, payload(50, 9))).toDF("file_id", "content")
    val zr = ArchiveOps.zipMembers(zdf).orderBy("file_id", "member_idx").collect()
    assert(zr.length == 3)
    assert(zr(0).getString(2) == "m0" && zr(1).getString(2) == "m1")
    assert(!zr(2).getBoolean(5) && zr(2).getLong(1) == -1L)
    val tdf = Seq((0L, goodTar), (1L, payload(512, 4))).toDF("file_id", "content")
    val tr = ArchiveOps.tarMembers(tdf).orderBy("file_id", "member_idx").collect()
    assert(tr.length == 2)
    assert(tr(0).getString(2) == "t0" && tr(0).getBoolean(5))
    assert(!tr(1).getBoolean(5))
  }

  test("totality fuzz: random and bit-flipped buffers never throw") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val n = rnd.nextInt(2000)
      val buf = new Array[Byte](n)
      rnd.nextBytes(buf)
      ArchiveOps.parseZip(buf) // must not throw
      ArchiveOps.parseTar(buf)
      ArchiveOps.parseTarGz(buf)
    }
    val zip = ArchiveOps.buildZip(Seq(("f", payload(64, 1), true), ("g", payload(32, 2), false)))
    val tar = ArchiveOps.buildTar(Seq(("f", payload(64, 1))))
    (0 until 200).foreach { _ =>
      val bz = zip.clone(); bz(rnd.nextInt(bz.length)) = rnd.nextInt(256).toByte
      ArchiveOps.parseZip(bz)
      val bt = tar.clone(); bt(rnd.nextInt(bt.length)) = rnd.nextInt(256).toByte
      ArchiveOps.parseTar(bt)
    }
  }
}
