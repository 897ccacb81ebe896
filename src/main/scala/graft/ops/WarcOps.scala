package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) container walk — the format web-scale training
  * corpora actually arrive in (Common-Crawl-style archives). Pure-JVM
  * record splitter over in-memory bytes: each record is a `WARC/1.0` (or
  * 1.1) version line, CRLF header lines up to a blank line, exactly
  * `Content-Length` payload bytes, and the spec's two-CRLF record
  * separator. Unknown headers ride along untouched; header names are
  * case-insensitive per spec.
  *
  * Same totality contract as the codec family: malformed framing — a bad
  * version line, a missing/absent Content-Length, a payload running past
  * the buffer, a broken separator — returns None, never a misparse, so a
  * poison archive member degrades instead of killing the task. (Real
  * `.warc.gz` members are per-record gzip — decompression is the
  * storage layer's job; this kernel owns the framing.)
  *
  * Scale shape: archives are parsed PER FILE inside a task (the
  * binaryFile envelope pattern of [[MultimodalOps]]); only the extracted
  * record rows — uri, type, length, and whatever projection the caller
  * keeps — ever enter a shuffle, the archive bytes never do.
  */
object WarcOps {

  final case class WarcRecord(warcType: String, targetUri: String,
      date: String, contentLength: Long, payload: Array[Byte])

  /** Parse a whole WARC file; None on any framing violation. */
  def parseAll(b: Array[Byte]): Option[Vector[WarcRecord]] = {
    try {
      var i = 0
      var out = Vector.empty[WarcRecord]
      while (i < b.length) {
        // version line
        val lineEnd = indexOfCrlf(b, i)
        if (lineEnd < 0) return None
        val version = new String(b, i, lineEnd - i, "US-ASCII")
        if (version != "WARC/1.0" && version != "WARC/1.1") return None
        i = lineEnd + 2
        // header lines until the blank line
        var warcType = ""; var uri = ""; var date = ""
        var len = -1L
        var blank = false
        while (!blank) {
          val he = indexOfCrlf(b, i)
          if (he < 0) return None
          if (he == i) { blank = true; i += 2 }
          else {
            val line = new String(b, i, he - i, "UTF-8")
            i = he + 2
            val colon = line.indexOf(':')
            if (colon <= 0) return None
            val name = line.substring(0, colon).trim.toLowerCase
            val value = line.substring(colon + 1).trim
            name match {
              case "warc-type" => warcType = value
              case "warc-target-uri" => uri = value
              case "warc-date" => date = value
              case "content-length" =>
                len = value.toLongOption.getOrElse(return None)
                if (len < 0) return None
              case _ => () // record-id, digest, content-type, ... — ride along
            }
          }
        }
        if (len < 0) return None // Content-Length is mandatory
        if (i + len > b.length) return None
        val payload = java.util.Arrays.copyOfRange(b, i, (i + len).toInt)
        i += len.toInt
        // the spec's record separator: exactly two CRLFs
        if (i + 4 > b.length || b(i) != '\r' || b(i + 1) != '\n' ||
          b(i + 2) != '\r' || b(i + 3) != '\n') return None
        i += 4
        out :+= WarcRecord(warcType, uri, date, len, payload)
      }
      if (out.isEmpty) None else Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Parse a `.warc.gz` image: per-record (or multi-record) gzip members
    * concatenated back to back — the Common-Crawl storage layout.
    * `GZIPInputStream` consumes ALL members of a concatenated stream, so
    * decompress-then-frame is one pass; gzip-level corruption or a
    * framing violation inside returns None like everything else. The
    * decompressed size is bounded to 64 MiB per archive — a zip-bomb
    * member degrades, it doesn't OOM the task.
    */
  def parseGz(b: Array[Byte], maxBytes: Int = 64 << 20): Option[Vector[WarcRecord]] = {
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
      parseAll(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One gzip member around `raw` (the writer twin of [[parseGz]]'s
    * per-record-member layout when called once per record).
    */
  def gzipMember(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    bos.toByteArray
  }

  /** Parsed HTTP response head of a WARC `response` record's payload —
    * the next thing every Common-Crawl-style pipeline reads after the
    * record frame: status + Content-Type decide keep/drop/route long
    * before anybody looks at the body.
    */
  final case class HttpResponse(status: Int, contentType: String,
      body: Array[Byte])

  /** Parse an HTTP/1.x response message (RFC 9112 framing): status line
    * `HTTP/1.<x> NNN <reason>`, CRLF header lines (case-insensitive
    * names) up to a blank line, then the body. When a `Content-Length`
    * header is present it must equal the remaining bytes (WARC payloads
    * are already length-framed by the RECORD's Content-Length, so a
    * disagreement means the payload was truncated or mis-framed);
    * absent, the body is everything after the blank line. Same totality
    * contract as the record splitter: any malformation — short status
    * line, non-numeric status, header without a colon, missing blank
    * line — returns None, never a misparse.
    */
  def parseHttpResponse(b: Array[Byte]): Option[HttpResponse] = {
    try {
      val lineEnd = indexOfCrlf(b, 0)
      if (lineEnd < 0) return None
      val statusLine = new String(b, 0, lineEnd, "US-ASCII")
      if (!statusLine.startsWith("HTTP/1.")) return None
      val parts = statusLine.split(" ", 3)
      if (parts.length < 2 || parts(1).length != 3) return None
      val status = parts(1).toIntOption.getOrElse(return None)
      if (status < 100 || status > 599) return None
      var i = lineEnd + 2
      var contentType = ""
      var declaredLen = -1L
      var blank = false
      while (!blank) {
        val he = indexOfCrlf(b, i)
        if (he < 0) return None
        if (he == i) { blank = true; i += 2 }
        else {
          val line = new String(b, i, he - i, "UTF-8")
          i = he + 2
          val colon = line.indexOf(':')
          if (colon <= 0) return None
          val name = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          name match {
            case "content-type" => contentType = value
            case "content-length" =>
              declaredLen = value.toLongOption.getOrElse(return None)
              if (declaredLen < 0) return None
            case _ => () // server, date, etags, ... — ride along
          }
        }
      }
      val bodyLen = b.length - i
      if (declaredLen >= 0 && declaredLen != bodyLen) return None
      Some(HttpResponse(status, contentType,
        java.util.Arrays.copyOfRange(b, i, b.length)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Writer twin of [[parseHttpResponse]] (generator, specs, and the
    * `warc_http_meta` oracle row).
    */
  def buildHttpResponse(status: Int, reason: String, contentType: String,
      body: Array[Byte]): Array[Byte] = {
    val head = (s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
    val out = new Array[Byte](head.length + body.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Writer twin: one spec-framed record (used by the generator, the
    * specs, and the `warc_meta` oracle row).
    */
  def buildRecord(warcType: String, targetUri: String, date: String,
      payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder()
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    if (targetUri.nonEmpty) sb.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    sb.append("WARC-Date: ").append(date).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes("UTF-8")
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Explode a (file_id, bytes) frame of WARC archives into one row per
    * record — the ingestion entry point. Undecodable archives surface as
    * a single row with n_records = 0 (observable, like the media prep
    * fallback) rather than vanishing.
    */
  def records(files: DataFrame, idCol: String = "file_id",
      payloadCol: String = "content"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (fid, bytes) =>
        WarcOps.parseAll(bytes) match {
          case Some(rs) => rs.zipWithIndex.map { case (r, k) =>
            (fid, k.toLong, r.warcType, r.targetUri, r.date, r.contentLength, true)
          }
          case None => Seq((fid, -1L, "", "", "", 0L, false))
        }
      }
      .toDF(idCol, "rec_idx", "warc_type", "target_uri", "warc_date",
        "content_length", "parsed")
  }

  /** [[records]] plus the HTTP head of every `response` record — status
    * and Content-Type (NULL for non-response records and for payloads
    * that fail [[parseHttpResponse]], with `http_ok` flagging the parse
    * outcome) — the Common-Crawl triage projection: status/content-type
    * decide keep/drop/route before any body byte is looked at. Same
    * scale shape as [[records]]: archives parse per file inside the
    * task; only the projected record rows shuffle.
    */
  def httpRecords(files: DataFrame, idCol: String = "file_id",
      payloadCol: String = "content"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (fid, bytes) =>
        WarcOps.parseAll(bytes) match {
          case Some(rs) => rs.zipWithIndex.map { case (r, k) =>
            val http = if (r.warcType == "response")
              parseHttpResponse(r.payload) else None
            (fid, k.toLong, r.warcType, r.targetUri, r.contentLength,
              http.map(_.status), http.map(_.contentType),
              http.map(_.body.length.toLong), http.isDefined)
          }
          case None =>
            Seq((fid, -1L, "", "", 0L, Option.empty[Int],
              Option.empty[String], Option.empty[Long], false))
        }
      }
      .toDF(idCol, "rec_idx", "warc_type", "target_uri", "content_length",
        "http_status", "http_content_type", "http_body_len", "http_ok")
  }
}
