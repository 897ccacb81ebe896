package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ZIP and TAR container walks — with WARC ([[WarcOps]]) these are the
  * three archive formats bulk corpora actually arrive in (dataset dumps
  * ship as `.zip`/`.tar.gz` at least as often as as WARC). Pure-JVM,
  * in-memory kernels with the codec family's totality contract: any
  * framing violation — bad signature, truncated header, length running
  * past the buffer, checksum/CRC mismatch — returns None, never a
  * misparse, so one poison archive degrades instead of killing its task.
  *
  * Scale shape (the [[WarcOps]]/[[MultimodalOps]] envelope pattern):
  * archives parse PER FILE inside a task; only extracted member rows —
  * name, size, whatever projection the caller keeps — ever enter a
  * shuffle, the archive bytes never do. Decompressed output is bounded
  * (64 MiB per archive) so a zip bomb degrades, it doesn't OOM.
  *
  * ZIP per APPNOTE.TXT (PKWARE's public spec): local file headers,
  * central directory, end-of-central-directory record; methods 0
  * (stored) and 8 (raw DEFLATE via `java.util.zip.Inflater(nowrap)`),
  * CRC-32 verified per member. Encrypted members, zip64 markers, and
  * other methods are REJECTED, not misread. Member metadata is read from
  * the CENTRAL directory (authoritative per spec — local headers may
  * carry zeros under the streaming/data-descriptor convention, flag bit
  * 3).
  *
  * TAR per POSIX ustar: 512-byte header blocks (octal size/checksum
  * fields; checksum computed with its own field blanked), data padded to
  * block size, two zero-block terminator. Both magic spellings accepted
  * (`ustar\0` POSIX and `ustar  ` old-GNU). `.tar.gz` rides one
  * GZIPInputStream pass (concatenated members drain like WarcOps.parseGz).
  */
object ArchiveOps extends Tables.Pack {
  import Tables._

  // ------------------------------------------------------------------ ZIP

  /** One extracted ZIP member: `data` is the DECOMPRESSED payload. */
  final case class ZipMember(name: String, method: Int, compSize: Long,
      uncompSize: Long, crc: Long, data: Array[Byte])

  private val LocalSig = 0x04034b50
  private val CentralSig = 0x02014b50
  private val EocdSig = 0x06054b50

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Parse a whole ZIP image via its central directory; None on any
    * framing violation, unknown method, encryption, zip64, CRC or size
    * mismatch. Total decompressed output bounded by `maxBytes`.
    */
  def parseZip(b: Array[Byte], maxBytes: Int = 64 << 20): Option[Vector[ZipMember]] = {
    try {
      // EOCD: scan back over the (0..65535-byte) trailing comment
      var e = b.length - 22
      val floor = math.max(0, b.length - 22 - 65535)
      while (e >= floor && u32le(b, e) != EocdSig) e -= 1
      if (e < floor || e < 0) return None
      val nEntries = u16le(b, e + 10)
      if (u16le(b, e + 8) != nEntries || u16le(b, e + 4) != 0) return None // multi-disk
      val cdOff = u32le(b, e + 16)
      if (cdOff > e) return None
      var i = cdOff.toInt
      var out = Vector.empty[ZipMember]
      var budget = maxBytes.toLong
      var k = 0
      while (k < nEntries) {
        if (i + 46 > b.length || u32le(b, i) != CentralSig) return None
        val flags = u16le(b, i + 8)
        if ((flags & 0x1) != 0) return None // encrypted
        val method = u16le(b, i + 10)
        if (method != 0 && method != 8) return None
        val crc = u32le(b, i + 16)
        val compSize = u32le(b, i + 20)
        val uncompSize = u32le(b, i + 24)
        if (compSize == 0xffffffffL || uncompSize == 0xffffffffL) return None // zip64
        val nameLen = u16le(b, i + 28)
        val extraLen = u16le(b, i + 30)
        val commentLen = u16le(b, i + 32)
        val lhOff = u32le(b, i + 42)
        if (i + 46 + nameLen > b.length) return None
        val name = new String(b, i + 46, nameLen, "UTF-8")
        i += 46 + nameLen + extraLen + commentLen
        // local header: sizes/CRC may be zero under the data-descriptor
        // convention — the central directory above is authoritative
        val lh = lhOff.toInt
        if (lh < 0 || lh + 30 > b.length || u32le(b, lh) != LocalSig) return None
        val lhNameLen = u16le(b, lh + 26)
        val lhExtraLen = u16le(b, lh + 28)
        val dataOff = lh + 30 + lhNameLen + lhExtraLen
        if (dataOff + compSize > b.length) return None
        if (uncompSize > budget) return None
        val raw = java.util.Arrays.copyOfRange(b, dataOff, (dataOff + compSize).toInt)
        val data =
          if (method == 0) {
            if (compSize != uncompSize) return None
            raw
          } else {
            val inf = new java.util.zip.Inflater(true) // raw DEFLATE
            try {
              inf.setInput(raw)
              val outB = new Array[Byte](uncompSize.toInt)
              var got = 0
              while (got < outB.length && !inf.finished()) {
                val n = inf.inflate(outB, got, outB.length - got)
                if (n == 0 && inf.needsInput()) return None // truncated stream
                got += n
              }
              if (got != uncompSize) return None
              outB
            } finally inf.end()
          }
        budget -= uncompSize
        val c = new java.util.zip.CRC32()
        c.update(data)
        if (c.getValue != crc) return None
        out :+= ZipMember(name, method, compSize, uncompSize, crc, data)
        k += 1
      }
      Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Writer twin: local headers + central directory + EOCD. `deflate`
    * per entry selects method 8 (raw Deflater) vs 0 (stored).
    */
  def buildZip(entries: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    final case class Rec(name: Array[Byte], method: Int, crc: Long,
        comp: Array[Byte], uncompLen: Int, off: Long)
    val recs = entries.map { case (name, data, deflate) =>
      val crc = new java.util.zip.CRC32(); crc.update(data)
      val comp =
        if (!deflate) data
        else {
          val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          try {
            d.setInput(data); d.finish()
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](4096)
            while (!d.finished()) out.write(buf, 0, d.deflate(buf))
            out.toByteArray
          } finally d.end()
        }
      val off = bos.size.toLong
      val nb = name.getBytes("UTF-8")
      w32(LocalSig); w16(20); w16(0); w16(if (deflate) 8 else 0)
      w16(0); w16(0) // mod time/date: fixed zeros (determinism)
      w32(crc.getValue); w32(comp.length); w32(data.length)
      w16(nb.length); w16(0)
      bos.write(nb); bos.write(comp)
      Rec(nb, if (deflate) 8 else 0, crc.getValue, comp, data.length, off)
    }
    val cdOff = bos.size.toLong
    recs.foreach { r =>
      w32(CentralSig); w16(20); w16(20); w16(0); w16(r.method)
      w16(0); w16(0)
      w32(r.crc); w32(r.comp.length); w32(r.uncompLen)
      w16(r.name.length); w16(0); w16(0); w16(0); w16(0); w32(0)
      w32(r.off); bos.write(r.name)
    }
    val cdLen = bos.size - cdOff
    w32(EocdSig); w16(0); w16(0); w16(recs.length); w16(recs.length)
    w32(cdLen); w32(cdOff); w16(0)
    bos.toByteArray
  }

  // ------------------------------------------------------------------ TAR

  /** One extracted TAR member (regular files only carry data). */
  final case class TarMember(name: String, size: Long, typeflag: Char,
      data: Array[Byte])

  private def octal(b: Array[Byte], o: Int, len: Int): Option[Long] = {
    var i = o
    val end = o + len
    // leading spaces/NULs tolerated, field ends at space/NUL
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    var v = 0L
    var any = false
    while (i < end && b(i) != ' ' && b(i) != 0) {
      val c = b(i)
      if (c < '0' || c > '7') return None
      v = v * 8 + (c - '0')
      if (v < 0) return None
      any = true
      i += 1
    }
    if (any) Some(v) else None
  }

  private def isZeroBlock(b: Array[Byte], o: Int): Boolean = {
    var i = o
    while (i < o + 512) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Parse a ustar image; None on any framing violation (bad magic, bad
    * octal, checksum mismatch, data past the buffer, missing
    * terminator). Directory/link members ride along without data.
    * GNU/pax name-extension members (typeflags L/K/x/g) are rejected —
    * their payloads rewrite the FOLLOWING member's name, so treating
    * them as opaque members would misreport names.
    */
  def parseTar(b: Array[Byte]): Option[Vector[TarMember]] = {
    try {
      if (b.length % 512 != 0 || b.length < 1024) return None
      var i = 0
      var out = Vector.empty[TarMember]
      var done = false
      while (!done) {
        if (i + 512 > b.length) return None
        if (isZeroBlock(b, i)) {
          // terminator: second zero block, then only zero padding
          if (i + 1024 > b.length || !isZeroBlock(b, i + 512)) return None
          var j = i + 1024
          while (j < b.length) { if (!isZeroBlock(b, j)) return None; j += 512 }
          done = true
        } else {
          val magic = new String(b, i + 257, 6, "US-ASCII")
          if (magic != "ustar\u0000" && magic != "ustar ") return None
          val size = octal(b, i + 124, 12).getOrElse(return None)
          if (size > b.length) return None // hostile size: reject before any Int math
          val stored = octal(b, i + 148, 8).getOrElse(return None)
          // checksum: header bytes with the chksum field read as spaces
          var sum = 0L
          var j = 0
          while (j < 512) {
            sum += (if (j >= 148 && j < 156) ' '.toLong else (b(i + j) & 0xffL))
            j += 1
          }
          if (sum != stored) return None
          var nameLen = 0
          while (nameLen < 100 && b(i + nameLen) != 0) nameLen += 1
          val name = new String(b, i, nameLen, "UTF-8")
          val tf = if (b(i + 156) == 0) '0' else (b(i + 156) & 0xff).toChar
          // GNU/pax extensions ('L' long-name, 'K' long-link, 'x'/'g' pax
          // headers) carry payloads that REWRITE the following member's
          // name; reporting them as opaque members (e.g. '././@LongLink')
          // would misreport member names. Rejected, not misread — the
          // decoder-plane totality contract.
          if (tf == 'L' || tf == 'K' || tf == 'x' || tf == 'g') return None
          val dataBlocks = ((size + 511) / 512).toInt
          if (i + 512 + dataBlocks * 512 > b.length) return None
          val data =
            if (tf == '0') java.util.Arrays.copyOfRange(b, i + 512, (i + 512 + size).toInt)
            else Array.emptyByteArray // dirs/links: size counts but no payload kept
          out :+= TarMember(name, size, tf, data)
          i += 512 + dataBlocks * 512
        }
      }
      if (out.isEmpty) None else Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** `.tar.gz`: one GZIPInputStream pass (concatenated members drain),
    * 64 MiB decompression bound, then [[parseTar]].
    */
  def parseTarGz(b: Array[Byte], maxBytes: Int = 64 << 20): Option[Vector[TarMember]] = {
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) {
        out.write(buf, 0, n)
        if (out.size > maxBytes) return None
        n = in.read(buf)
      }
      in.close()
      parseTar(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Writer twin: ustar regular files, fixed mode/uid/mtime zeros for
    * byte determinism, two zero-block terminator.
    */
  def buildTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val h = new Array[Byte](512)
      val nb = name.getBytes("UTF-8")
      require(nb.length <= 100, s"tar name too long: $name")
      System.arraycopy(nb, 0, h, 0, nb.length)
      def oct(v: Long, o: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val pad = len - 1 - s.length
        var i = 0
        while (i < pad) { h(o + i) = '0'; i += 1 }
        System.arraycopy(s.getBytes("US-ASCII"), 0, h, o + pad, s.length)
        h(o + len - 1) = 0
      }
      oct(0, 100, 8); oct(0, 108, 8); oct(0, 116, 8) // mode/uid/gid
      oct(data.length.toLong, 124, 12)
      oct(0, 136, 12) // mtime
      h(156) = '0'
      System.arraycopy("ustar\u000000".getBytes("US-ASCII"), 0, h, 257, 8)
      // checksum with its own field as spaces
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      var i = 0
      while (i < 512) { sum += (h(i) & 0xffL); i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val pad = 6 - cs.length
      i = 0
      while (i < pad) { h(148 + i) = '0'; i += 1 }
      System.arraycopy(cs.getBytes("US-ASCII"), 0, h, 148 + pad, cs.length)
      h(154) = 0; h(155) = ' '
      bos.write(h)
      bos.write(data)
      val rem = data.length % 512
      if (rem != 0) bos.write(new Array[Byte](512 - rem))
    }
    bos.write(new Array[Byte](1024))
    bos.toByteArray
  }

  /** Explode a (file_id, bytes) frame of ZIP archives into one row per
    * member — poison archives surface as a parsed=false row, they never
    * vanish (the WarcOps.records contract).
    */
  def zipMembers(files: DataFrame, idCol: String = "file_id",
      payloadCol: String = "content"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (fid, bytes) =>
        parseZip(bytes) match {
          case Some(ms) => ms.zipWithIndex.map { case (m, k) =>
            (fid, k.toLong, m.name, m.method, m.uncompSize, true)
          }
          case None => Seq((fid, -1L, "", -1, 0L, false))
        }
      }
      .toDF(idCol, "member_idx", "name", "method", "size", "parsed")
  }

  /** Explode a (file_id, bytes) frame of TAR (or gz=`true` `.tar.gz`)
    * archives into one row per member; same poison contract.
    */
  def tarMembers(files: DataFrame, gz: Boolean = false, idCol: String = "file_id",
      payloadCol: String = "content"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (fid, bytes) =>
        (if (gz) parseTarGz(bytes) else parseTar(bytes)) match {
          case Some(ms) => ms.zipWithIndex.map { case (m, k) =>
            (fid, k.toLong, m.name, m.typeflag.toString, m.size, true)
          }
          case None => Seq((fid, -1L, "", "", 0L, false))
        }
      }
      .toDF(idCol, "member_idx", "name", "typeflag", "size", "parsed")
  }

  // ------------------------------------------------- oracle-gated rows

  val queries: Map[String, Q] = Map(
    "zip_meta" -> ((s, d) => {
      // The ZIP walk under the DUCKDB gate: per doc a multi-member
      // archive — names, lengths, and payload bytes pure functions of
      // (doc_id, k, j) — framed by the REAL writer (local headers +
      // central directory + EOCD, members alternating stored/deflated)
      // and re-parsed by the REAL central-directory walk with CRC-32
      // verification. Deflate round-trips losslessly, so the oracle
      // recomputes member counts, name lengths, uncompressed sizes, and
      // the payload byte sum symbolically; a header-offset, inflate, or
      // CRC defect breaks the row (parse failure => sys.error). Per-row
      // kernel, archive bytes never leave the task.
      import s.implicits._
      t(s, d, "documents").select(col("doc_id")).as[Long].map { id =>
        val ne = (1 + id % 3).toInt
        val entries = (0 until ne).map { k =>
          val plen = (10 + (id * 7 + k * 13) % 40).toInt
          val pay = Array.tabulate(plen)(j => ((id + k * 17 + j.toLong * 31) % 256).toByte)
          (s"doc$id/part$k.txt", pay, (id + k) % 2 == 0)
        }
        val zip = buildZip(entries)
        val ms = parseZip(zip).getOrElse(sys.error(s"zip parse failed for doc $id"))
        if (ms.length != ne) sys.error(s"zip member count for doc $id")
        var paySum = 0L; var uncLen = 0L; var namesLen = 0L; var nDef = 0L
        ms.zipWithIndex.foreach { case (m, k) =>
          if (!java.util.Arrays.equals(m.data, entries(k)._2))
            sys.error(s"zip payload divergence for doc $id member $k")
          uncLen += m.uncompSize
          namesLen += m.name.length
          if (m.method == 8) nDef += 1
          m.data.foreach(b => paySum += (b & 0xff))
        }
        (id, ms.length.toLong, uncLen, namesLen, paySum, nDef)
      }.toDF("doc_id", "n_members", "unc_len", "names_len", "pay_sum", "n_deflated")
        .orderBy("doc_id")
    }),

    "tar_meta" -> ((s, d) => {
      // The ustar walk under the DUCKDB gate: per doc a multi-member tar
      // through the REAL writer + parser (octal fields, blanked-field
      // checksum, 512-byte padding, zero-block terminator), plus the
      // `.tar.gz` leg through one GZIPInputStream pass. n_blocks checks
      // the BLOCK ARITHMETIC itself: 2 terminator blocks + per member
      // 1 header + ceil(size/512) data blocks — a padding or terminator
      // defect moves it even when payloads survive. Per-row kernel,
      // bytes never leave the task.
      import s.implicits._
      t(s, d, "documents").select(col("doc_id")).as[Long].map { id =>
        val nm = (1 + id % 4).toInt
        val entries = (0 until nm).map { k =>
          val plen = (30 + (id * 5 + k * 11) % 1000).toInt
          (s"d$id/f$k.txt", Array.tabulate(plen)(j => ((id * 3 + k * 7 + j.toLong * 13) % 256).toByte))
        }
        val tar = buildTar(entries)
        val ms = parseTar(tar).getOrElse(sys.error(s"tar parse failed for doc $id"))
        if (ms.length != nm) sys.error(s"tar member count for doc $id")
        var paySum = 0L; var totSize = 0L; var namesLen = 0L
        ms.zipWithIndex.foreach { case (m, k) =>
          if (!java.util.Arrays.equals(m.data, entries(k)._2))
            sys.error(s"tar payload divergence for doc $id member $k")
          totSize += m.size
          namesLen += m.name.length
          m.data.foreach(b => paySum += (b & 0xff))
        }
        val gzMs = parseTarGz(WarcOps.gzipMember(tar))
          .getOrElse(sys.error(s"tar.gz parse failed for doc $id"))
        var gzSum = 0L
        gzMs.foreach(_.data.foreach(b => gzSum += (b & 0xff)))
        if (gzSum != paySum) sys.error(s"tar.gz payload divergence for doc $id")
        val nBlocks = tar.length / 512L
        (id, ms.length.toLong, totSize, namesLen, paySum, nBlocks, gzMs.length.toLong)
      }.toDF("doc_id", "n_members", "total_size", "names_len", "pay_sum",
          "n_blocks", "n_gz_members")
        .orderBy("doc_id")
    }),

    "ico_meta" -> ((s, d) => {
      // The ICO favicon container under the DUCKDB gate: per doc a
      // 24bpp BMP member (doubled-height header, bottom-up rows, 1bpp
      // AND mask APPLIED — masked pixels composite to black) and, for
      // even ids, a second member that is a complete PNG file inside the
      // directory — both through the REAL writer and walker
      // ([[IcoCodec]]). A directory-offset, stride/padding, bottom-up,
      // BGR-order, or mask-bit defect moves a sum. Per-row kernel,
      // bytes never leave the task.
      import s.implicits._
      t(s, d, "documents").select(col("doc_id")).as[Long].map { id =>
        val w0 = (4 + id % 6).toInt; val h0 = (4 + (id * 5) % 6).toInt
        val rgb0 = new Array[Byte](w0 * h0 * 3)
        var p = 0
        while (p < w0 * h0) {
          val v = ((id * 7 + p.toLong * 13) % 256).toByte
          rgb0(p * 3) = v; rgb0(p * 3 + 1) = v; rgb0(p * 3 + 2) = v
          p += 1
        }
        val members = scala.collection.mutable.ArrayBuffer(
          ImageCodec.Raster(w0, h0, rgb0))
        if (id % 2 == 0) {
          val w1 = (3 + id % 4).toInt; val h1 = (3 + (id * 3) % 4).toInt
          val rgb1 = new Array[Byte](w1 * h1 * 3)
          p = 0
          while (p < w1 * h1) {
            val v = ((id + p.toLong * 29) % 256).toByte
            rgb1(p * 3) = v; rgb1(p * 3 + 1) = v; rgb1(p * 3 + 2) = v
            p += 1
          }
          members += ImageCodec.Raster(w1, h1, rgb1)
        }
        val ico = IcoCodec.buildIco(members.toSeq, asPng = _ == 1,
            masked = (k, x, y) => k == 0 && (x + y + id) % 5 == 0)
          .getOrElse(sys.error(s"ico build failed for doc $id"))
        val dec = IcoCodec.decodeIco(ico)
          .getOrElse(sys.error(s"ico decode failed for doc $id"))
        if (dec.length != members.length) sys.error(s"ico member count for doc $id")
        def sumOf(r: ImageCodec.Raster): Long = {
          var s0 = 0L; r.rgb.foreach(b => s0 += (b & 0xff)); s0
        }
        val sum1 = if (dec.length > 1) {
          // the PNG member must round-trip exactly (no mask on it)
          if (!java.util.Arrays.equals(dec(1).rgb, members(1).rgb))
            sys.error(s"ico png member divergence for doc $id")
          sumOf(dec(1))
        } else 0L
        (id, dec.length.toLong, sumOf(dec(0)), sum1)
      }.toDF("doc_id", "n_members", "sum_bmp", "sum_png")
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // symbolic twin of the ZIP legs: counts, name lengths, uncompressed
    // sizes, and payload byte sums are pure functions of (doc_id, k, j);
    // names_len = len("doc") + digits(id) + len("/part") + digits(k) +
    // len(".txt") — k < 3 so digits(k) = 1
    "zip_meta" ->
      """WITH mem AS (
        |  SELECT doc_id, k, (10 + (doc_id * 7 + k * 13) % 40)::BIGINT AS plen,
        |         (length('doc' || doc_id::VARCHAR || '/part' || k::VARCHAR || '.txt'))::BIGINT AS nlen,
        |         CASE WHEN (doc_id + k) % 2 = 0 THEN 1 ELSE 0 END AS defl
        |  FROM (SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS k FROM documents)),
        |pays AS (
        |  SELECT doc_id, sum((doc_id + k * 17 + j * 31) % 256)::BIGINT AS s
        |  FROM (SELECT doc_id, k, unnest(range(0, plen)) AS j FROM mem)
        |  GROUP BY doc_id)
        |SELECT m.doc_id, count(*)::BIGINT AS n_members,
        |       sum(m.plen)::BIGINT AS unc_len, sum(m.nlen)::BIGINT AS names_len,
        |       max(p.s)::BIGINT AS pay_sum, sum(m.defl)::BIGINT AS n_deflated
        |FROM mem m JOIN pays p USING (doc_id)
        |GROUP BY m.doc_id ORDER BY m.doc_id""".stripMargin,

    // symbolic twin of the TAR legs including the block arithmetic:
    // n_blocks = 2 + sum over members of (1 + ceil(size/512))
    "tar_meta" ->
      """WITH mem AS (
        |  SELECT doc_id, k, (30 + (doc_id * 5 + k * 11) % 1000)::BIGINT AS plen,
        |         (length('d' || doc_id::VARCHAR || '/f' || k::VARCHAR || '.txt'))::BIGINT AS nlen
        |  FROM (SELECT doc_id, unnest(range(0, 1 + doc_id % 4)) AS k FROM documents)),
        |pays AS (
        |  SELECT doc_id, sum((doc_id * 3 + k * 7 + j * 13) % 256)::BIGINT AS s
        |  FROM (SELECT doc_id, k, unnest(range(0, plen)) AS j FROM mem)
        |  GROUP BY doc_id)
        |SELECT m.doc_id, count(*)::BIGINT AS n_members,
        |       sum(m.plen)::BIGINT AS total_size, sum(m.nlen)::BIGINT AS names_len,
        |       max(p.s)::BIGINT AS pay_sum,
        |       (2 + sum(1 + (m.plen + 511) // 512))::BIGINT AS n_blocks,
        |       count(*)::BIGINT AS n_gz_members
        |FROM mem m JOIN pays p USING (doc_id)
        |GROUP BY m.doc_id ORDER BY m.doc_id""".stripMargin,

    // symbolic twin of the ICO legs: the BMP member's gray ramp with the
    // (x+y+id)%5 mask pixels blacked, and the even-id PNG member's ramp
    "ico_meta" ->
      """WITH dims AS (
        |  SELECT doc_id, (4 + doc_id % 6)::BIGINT AS w0, (4 + (doc_id * 5) % 6)::BIGINT AS h0,
        |         (3 + doc_id % 4)::BIGINT AS w1, (3 + (doc_id * 3) % 4)::BIGINT AS h1
        |  FROM documents),
        |bmp AS (
        |  SELECT doc_id,
        |    (3 * sum(CASE WHEN (p % w0 + p // w0 + doc_id) % 5 = 0 THEN 0
        |                  ELSE (doc_id * 7 + p * 13) % 256 END))::BIGINT AS s
        |  FROM (SELECT doc_id, w0, unnest(range(0, w0 * h0)) AS p FROM dims)
        |  GROUP BY doc_id),
        |png AS (
        |  SELECT doc_id, (3 * sum((doc_id + p * 29) % 256))::BIGINT AS s
        |  FROM (SELECT doc_id, unnest(range(0, w1 * h1)) AS p
        |        FROM dims WHERE doc_id % 2 = 0)
        |  GROUP BY doc_id)
        |SELECT d.doc_id,
        |       (CASE WHEN d.doc_id % 2 = 0 THEN 2 ELSE 1 END)::BIGINT AS n_members,
        |       b.s AS sum_bmp, coalesce(g.s, 0)::BIGINT AS sum_png
        |FROM dims d JOIN bmp b USING (doc_id) LEFT JOIN png g USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin
  )
}
