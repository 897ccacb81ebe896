package graft.ops

/** MIME content-transfer-encoding kernels — the plane the reference's
  * Gmail ingestion actually lives in (its attachment payloads arrive
  * base64url-encoded; quoted-printable is the other RFC 2045 encoding a
  * mail corpus carries, used for mostly-ASCII bodies).
  *
  * Same totality contract as the codec family: malformed escapes return
  * None, never a misdecode.
  *
  * Reference: RFC 2045 §6.7 — `=XX` uppercase-hex escapes, `=` + CRLF (or
  * bare LF, tolerated) is a SOFT line break that decodes to nothing,
  * lines of encoded output stay ≤ 76 chars.
  */
object MimeOps {

  /** Decode quoted-printable text to bytes. Accepts lowercase hex (real
    * mail contains it); a dangling `=` or a non-hex escape is malformed.
    */
  def decodeQp(s: String): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '=') {
        if (i + 2 < n && s.charAt(i + 1) == '\r' && s.charAt(i + 2) == '\n') i += 3
        else if (i + 1 < n && s.charAt(i + 1) == '\n') i += 2 // tolerated bare-LF soft break
        else if (i + 2 < n) {
          val hi = Character.digit(s.charAt(i + 1), 16)
          val lo = Character.digit(s.charAt(i + 2), 16)
          if (hi < 0 || lo < 0) return None
          out.write((hi << 4) | lo)
          i += 3
        } else return None // dangling escape
      } else {
        out.write(c.toInt & 0xff)
        i += 1
      }
    }
    Some(out.toByteArray)
  }

  /** Encoder twin: `=XX` for bytes outside printable ASCII (and for `=`
    * itself), soft breaks keep every encoded line ≤ `lineLen` chars.
    */
  def encodeQp(bytes: Array[Byte], lineLen: Int = 76): String = {
    require(lineLen >= 4, "a line must fit one escape plus the soft break")
    val sb = new StringBuilder()
    var col = 0
    def put(tok: String): Unit = {
      // the soft break's '=' occupies a column, so flush at lineLen-1
      if (col + tok.length > lineLen - 1) { sb.append("=\r\n"); col = 0 }
      sb.append(tok); col += tok.length
    }
    bytes.foreach { b =>
      val v = b & 0xff
      if (v >= 33 && v <= 126 && v != '=') put(v.toChar.toString)
      else if (v == ' ') put(" ") // mid-line spaces stay literal
      else put(f"=${v}%02X")
    }
    sb.toString
  }
}
