package graft.ops

/** EXIF metadata (JEITA CP-3451 / TIFF 6.0, both public specs): an APP1
  * segment tagged `Exif\0\0` embedding a little-or-big-endian TIFF
  * structure — IFD0 carrying the camera-level tags plus a 0x8769 pointer
  * to the Exif sub-IFD. This is the image-metadata surface every
  * training-data pipeline extracts (orientation for correct decode,
  * timestamps for dedup/provenance, ISO/dimensions for quality gates),
  * and it composes two codec planes the engine already has: the JPEG
  * segment walk (marker/length framing, APPn skipping) and the TIFF
  * IFD walk (endian-aware field reads, the inline-vs-offset 4-byte
  * value rule).
  *
  * Builder and parser are exact inverses for the supported tag set;
  * the parser carries the codec-plane totality contract — malformed
  * framing, truncated IFDs, offsets past the buffer, or a missing
  * Exif APP1 return None, never garbage.
  */
object ExifCodec {

  /** Parsed EXIF summary (the tags the builder writes). */
  case class Exif(
      byteOrder: String, // "II" | "MM"
      orientation: Int, // 0x0112 SHORT
      xresNum: Long, xresDen: Long, // 0x011A RATIONAL
      dateTime: String, // 0x0132 ASCII (19 chars + NUL)
      iso: Int, // 0x8827 SHORT (Exif sub-IFD)
      pixelX: Long) // 0xA002 LONG (Exif sub-IFD)

  private val ExifHeader = Array[Byte]('E', 'x', 'i', 'f', 0, 0)

  /** Build the APP1 payload (marker + length + Exif\0\0 + TIFF). */
  def buildApp1(le: Boolean, orientation: Int, xresNum: Long, xresDen: Long,
      dateTime: String, iso: Int, pixelX: Long): Array[Byte] = {
    require(dateTime.length == 19, "EXIF DateTime is exactly 19 chars")
    val tiff = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { tiff.write(v & 0xff); tiff.write((v >> 8) & 0xff) }
      else { tiff.write((v >> 8) & 0xff); tiff.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (le) { tiff.write((v & 0xff).toInt); tiff.write(((v >> 8) & 0xff).toInt)
        tiff.write(((v >> 16) & 0xff).toInt); tiff.write(((v >> 24) & 0xff).toInt) }
      else { tiff.write(((v >> 24) & 0xff).toInt); tiff.write(((v >> 16) & 0xff).toInt)
        tiff.write(((v >> 8) & 0xff).toInt); tiff.write((v & 0xff).toInt) }
    // entry writer: SHORT/LONG values ride inline in the 4-byte value
    // field (SHORT in its FIRST two bytes, per byte order); larger
    // values (RATIONAL, the 20-byte ASCII) live at a data offset
    def entry(tag: Int, typ: Int, cnt: Int, inline: Option[Long], offset: Option[Long]): Unit = {
      w16(tag); w16(typ); w32(cnt.toLong)
      (inline, offset) match {
        case (Some(v), _) if typ == 3 => w16(v.toInt); w16(0) // SHORT inline
        case (Some(v), _) => w32(v) // LONG inline
        case (_, Some(o)) => w32(o)
        case _ => w32(0L)
      }
    }
    // layout (offsets relative to TIFF start):
    //   8   IFD0: count(2) + 4 entries(48) + next(4)  -> ends 62
    //   62  xres RATIONAL (8)
    //   70  DateTime ASCII (20)
    //   90  Exif sub-IFD: count(2) + 2 entries(24) + next(4)
    if (le) { tiff.write('I'); tiff.write('I'); w16(0x2a) }
    else { tiff.write('M'); tiff.write('M'); w16(0x2a) }
    w32(8L)
    w16(4) // IFD0 entry count
    entry(0x0112, 3, 1, Some(orientation.toLong), None)
    entry(0x011a, 5, 1, None, Some(62L))
    entry(0x0132, 2, 20, None, Some(70L))
    entry(0x8769, 4, 1, Some(90L), None)
    w32(0L) // next IFD
    w32(xresNum); w32(xresDen)
    tiff.write(dateTime.getBytes("US-ASCII")); tiff.write(0)
    w16(2) // Exif sub-IFD entry count
    entry(0x8827, 3, 1, Some(iso.toLong), None)
    entry(0xa002, 4, 1, Some(pixelX), None)
    w32(0L)
    val t = tiff.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xe1)
    val len = 2 + ExifHeader.length + t.length
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(ExifHeader); out.write(t)
    out.toByteArray
  }

  /** Splice an APP1 segment immediately after SOI; None if not a JPEG. */
  def spliceApp1(jpeg: Array[Byte], app1: Array[Byte]): Option[Array[Byte]] = {
    if (jpeg.length < 2 || (jpeg(0) & 0xff) != 0xff || (jpeg(1) & 0xff) != 0xd8) None
    else {
      val out = new Array[Byte](jpeg.length + app1.length)
      System.arraycopy(jpeg, 0, out, 0, 2)
      System.arraycopy(app1, 0, out, 2, app1.length)
      System.arraycopy(jpeg, 2, out, 2 + app1.length, jpeg.length - 2)
      Some(out)
    }
  }

  /** Walk the JPEG segment stream, find the Exif APP1, parse its TIFF. */
  def parseExif(jpeg: Array[Byte]): Option[Exif] = {
    try {
      if (jpeg.length < 4 || (jpeg(0) & 0xff) != 0xff || (jpeg(1) & 0xff) != 0xd8) return None
      var i = 2
      while (i + 4 <= jpeg.length) {
        if ((jpeg(i) & 0xff) != 0xff) return None
        val marker = jpeg(i + 1) & 0xff
        if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS: no Exif seen
        val len = ((jpeg(i + 2) & 0xff) << 8) | (jpeg(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > jpeg.length) return None
        if (marker == 0xe1 && len >= 2 + 6 + 8 &&
          (0 until 6).forall(k => jpeg(i + 4 + k) == ExifHeader(k)))
          return parseTiffExif(jpeg, i + 10, len - 8)
        i += 2 + len
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def parseTiffExif(b: Array[Byte], base: Int, size: Int): Option[Exif] = {
    if (size < 8) return None
    def u8(o: Int): Int = {
      if (o < 0 || o >= size) throw new IndexOutOfBoundsException
      b(base + o) & 0xff
    }
    val le =
      if (u8(0) == 'I' && u8(1) == 'I') true
      else if (u8(0) == 'M' && u8(1) == 'M') false
      else return None
    def u16(o: Int): Int = if (le) u8(o) | (u8(o + 1) << 8) else (u8(o) << 8) | u8(o + 1)
    def u32(o: Int): Long =
      if (le) u8(o).toLong | (u8(o + 1).toLong << 8) | (u8(o + 2).toLong << 16) | (u8(o + 3).toLong << 24)
      else (u8(o).toLong << 24) | (u8(o + 1).toLong << 16) | (u8(o + 2).toLong << 8) | u8(o + 3).toLong
    try {
      if (u16(2) != 0x2a) return None
      val ifd0 = u32(4)
      if (ifd0 < 8 || ifd0 > Int.MaxValue) return None
      // one IFD -> (tag -> (type, count, valueFieldOffset))
      def readIfd(off: Long): Map[Int, (Int, Long, Int)] = {
        val o = off.toInt
        val n = u16(o)
        (0 until n).map { k =>
          val e = o + 2 + 12 * k
          u16(e) -> ((u16(e + 2), u32(e + 4), e + 8))
        }.toMap
      }
      val d0 = readIfd(ifd0)
      def shortTag(m: Map[Int, (Int, Long, Int)], tag: Int): Option[Int] =
        m.get(tag).collect { case (3, 1L, vo) => u16(vo) }
      def longTag(m: Map[Int, (Int, Long, Int)], tag: Int): Option[Long] =
        m.get(tag).collect { case (4, 1L, vo) => u32(vo) }
      val orientation = shortTag(d0, 0x0112).getOrElse(return None)
      val (xn, xd) = d0.get(0x011a).collect { case (5, 1L, vo) =>
        val off = u32(vo).toInt; (u32(off), u32(off + 4))
      }.getOrElse(return None)
      val dt = d0.get(0x0132).collect { case (2, cnt, vo) if cnt >= 2 && cnt <= 64 =>
        val off = u32(vo).toInt
        new String((0 until (cnt - 1).toInt).map(k => u8(off + k).toByte).toArray, "US-ASCII")
      }.getOrElse(return None)
      val sub = readIfd(longTag(d0, 0x8769).getOrElse(return None))
      val iso = shortTag(sub, 0x8827).getOrElse(return None)
      val px = longTag(sub, 0xa002).getOrElse(return None)
      Some(Exif(if (le) "II" else "MM", orientation, xn, xd, dt, iso, px))
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
