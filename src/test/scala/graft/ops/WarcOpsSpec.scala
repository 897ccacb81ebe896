package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class WarcOpsSpec extends AnyFunSuite with SparkSpec {

  private def rec(t: String, uri: String, pay: Array[Byte]): Array[Byte] =
    WarcOps.buildRecord(t, uri, "2024-01-01T00:00:00Z", pay)

  test("build -> parse round trip: multi-record, payload bytes exact, types kept") {
    val p1 = Array.tabulate[Byte](30)(i => (i * 7).toByte)
    val p2 = Array[Byte]() // zero-length payload is legal
    val p3 = "GET / HTTP/1.1\r\nHost: x\r\n\r\n".getBytes("UTF-8")
    val blob = rec("response", "https://a.test/1", p1) ++
      rec("warcinfo", "", p2) ++ rec("request", "https://a.test/2", p3)
    val rs = WarcOps.parseAll(blob).get
    assert(rs.length == 3)
    assert(rs(0).warcType == "response" && rs(0).targetUri == "https://a.test/1")
    assert(rs(0).payload.toSeq == p1.toSeq && rs(0).contentLength == 30)
    assert(rs(1).contentLength == 0 && rs(1).targetUri == "")
    assert(rs(2).payload.toSeq == p3.toSeq, "CRLFs inside a payload must not confuse framing")
  }

  test("header names fold case-insensitively; unknown headers ride along") {
    val body = "hello".getBytes
    val manual = ("WARC/1.1\r\n" +
      "warc-TYPE: response\r\n" +
      "WARC-Record-ID: <urn:uuid:x>\r\n" + // unknown to the parser: skipped
      "warc-target-uri: https://b.test/\r\n" +
      "CONTENT-length: 5\r\n" +
      "\r\n").getBytes("US-ASCII") ++ body ++ "\r\n\r\n".getBytes
    val rs = WarcOps.parseAll(manual).get
    assert(rs.length == 1 && rs(0).warcType == "response")
    assert(rs(0).targetUri == "https://b.test/" && rs(0).payload.toSeq == body.toSeq)
  }

  test("framing violations reject: version, content-length, truncation, separator") {
    val good = rec("response", "https://c.test/", "abcdef".getBytes)
    assert(WarcOps.parseAll(good).isDefined)
    // wrong version line
    val badV = good.clone(); badV(5) = '2'
    assert(WarcOps.parseAll(badV).isEmpty)
    // truncated payload (file ends early)
    assert(WarcOps.parseAll(java.util.Arrays.copyOf(good, good.length - 6)).isEmpty)
    // broken record separator
    val badSep = good.clone(); badSep(good.length - 1) = 'X'
    assert(WarcOps.parseAll(badSep).isEmpty)
    // missing Content-Length entirely
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n" + "xx\r\n\r\n").getBytes
    assert(WarcOps.parseAll(noLen).isEmpty)
    // empty input
    assert(WarcOps.parseAll(Array.emptyByteArray).isEmpty)
  }

  test(".warc.gz: concatenated per-record gzip members parse identically to the flat file") {
    val p1 = Array.tabulate[Byte](40)(i => (i * 3).toByte)
    val p2 = "HTTP/1.1 200 OK\r\n\r\nbody".getBytes
    val r1 = rec("response", "https://gz.test/1", p1)
    val r2 = rec("response", "https://gz.test/2", p2)
    val gz = WarcOps.gzipMember(r1) ++ WarcOps.gzipMember(r2) // member per record
    val viaGz = WarcOps.parseGz(gz).get
    val flat = WarcOps.parseAll(r1 ++ r2).get
    assert(viaGz.map(_.targetUri) == flat.map(_.targetUri))
    assert(viaGz.map(_.payload.toSeq) == flat.map(_.payload.toSeq))
    // one member holding both records also parses (multi-record members are legal)
    assert(WarcOps.parseGz(WarcOps.gzipMember(r1 ++ r2)).get.length == 2)
    // corrupt gzip rejects; truncated member rejects; non-gzip rejects
    val bad = gz.clone(); bad(gz.length / 2) = (bad(gz.length / 2) ^ 0x55).toByte
    WarcOps.parseGz(bad) // corrupt DEFLATE data: Some or None, never a throw
    assert(WarcOps.parseGz(java.util.Arrays.copyOf(gz, gz.length - 3)).isEmpty)
    assert(WarcOps.parseGz("plainly not gzip".getBytes).isEmpty)
  }

  test("totality fuzz: random corruption and truncation never throw") {
    val rnd = new scala.util.Random(7)
    val base = rec("response", "https://f.test/", Array.tabulate[Byte](64)(i => i.toByte)) ++
      rec("request", "https://f.test/2", "\r\n\r\nWARC/1.0\r\n".getBytes)
    assert(WarcOps.parseAll(base).get.length == 2)
    for (_ <- 1 to 300) {
      val mutated = base.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 1 to flips)
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      WarcOps.parseAll(mutated) // Some or None, never a throw
      WarcOps.parseAll(java.util.Arrays.copyOf(mutated, rnd.nextInt(mutated.length + 1)))
      ()
    }
  }

  test("http response head: build -> parse round trip, case-insensitive headers") {
    val body = Array.tabulate[Byte](25)(i => (i * 11).toByte)
    val msg = WarcOps.buildHttpResponse(301, "Moved Permanently",
      "text/html; charset=utf-8", body)
    val h = WarcOps.parseHttpResponse(msg).get
    assert(h.status == 301 && h.contentType == "text/html; charset=utf-8")
    assert(h.body.toSeq == body.toSeq)
    // hand-framed: folded-case headers, unknown headers ride along, no
    // Content-Length (body = rest after the blank line), HTTP/1.0 legal
    val manual = ("HTTP/1.0 404 Not Found\r\n" +
      "SERVER: x\r\n" +
      "content-TYPE: application/json\r\n" +
      "\r\n").getBytes("US-ASCII") ++ "{}".getBytes
    val m = WarcOps.parseHttpResponse(manual).get
    assert(m.status == 404 && m.contentType == "application/json")
    assert(new String(m.body) == "{}")
    // body containing CRLFCRLF must not re-frame (length framing wins)
    val tricky = WarcOps.buildHttpResponse(200, "OK", "text/plain",
      "a\r\n\r\nb".getBytes)
    assert(WarcOps.parseHttpResponse(tricky).get.body.length == 6)
  }

  test("http response head: malformations reject, never misparse") {
    val good = WarcOps.buildHttpResponse(200, "OK", "text/plain", "xyz".getBytes)
    assert(WarcOps.parseHttpResponse(good).isDefined)
    // not an HTTP status line
    assert(WarcOps.parseHttpResponse("GET / HTTP/1.1\r\n\r\n".getBytes).isEmpty)
    // non-numeric / out-of-range / short status
    assert(WarcOps.parseHttpResponse("HTTP/1.1 2xx OK\r\n\r\n".getBytes).isEmpty)
    assert(WarcOps.parseHttpResponse("HTTP/1.1 999 ?\r\n\r\n".getBytes).isEmpty)
    assert(WarcOps.parseHttpResponse("HTTP/1.1 20 OK\r\n\r\n".getBytes).isEmpty)
    // header without a colon
    assert(WarcOps.parseHttpResponse(
      "HTTP/1.1 200 OK\r\nbroken header\r\n\r\n".getBytes).isEmpty)
    // declared Content-Length disagreeing with the framed body
    assert(WarcOps.parseHttpResponse(
      "HTTP/1.1 200 OK\r\nContent-Length: 10\r\n\r\nxyz".getBytes).isEmpty)
    // missing blank line / truncation / empty
    assert(WarcOps.parseHttpResponse("HTTP/1.1 200 OK\r\n".getBytes).isEmpty)
    assert(WarcOps.parseHttpResponse(Array.emptyByteArray).isEmpty)
    // corruption fuzz: Some or None, never a throw
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 300) {
      val mutated = good.clone()
      for (_ <- 0 to rnd.nextInt(3))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      WarcOps.parseHttpResponse(mutated)
      WarcOps.parseHttpResponse(
        java.util.Arrays.copyOf(mutated, rnd.nextInt(mutated.length + 1)))
      ()
    }
  }

  test("httpRecords() enriches response records; requests and poison payloads stay NULL") {
    val s = spark
    import s.implicits._
    val okResp = rec("response", "https://h.test/0",
      WarcOps.buildHttpResponse(200, "OK", "text/html", "hello".getBytes))
    val req = rec("request", "https://h.test/1",
      "GET / HTTP/1.1\r\nHost: h\r\n\r\n".getBytes)
    val poisonResp = rec("response", "https://h.test/2", "not http".getBytes)
    val df = Seq((1L, okResp ++ req ++ poisonResp)).toDF("file_id", "content")
    val rows = WarcOps.httpRecords(df).collect()
      .map(r => (r.getLong(1), r.getString(2),
        if (r.isNullAt(5)) -1 else r.getInt(5),
        Option(r.getString(6)).getOrElse(""), r.getBoolean(8)))
      .toSet
    assert(rows.contains((0L, "response", 200, "text/html", true)))
    assert(rows.contains((1L, "request", -1, "", false)),
      "request records carry no http head")
    assert(rows.contains((2L, "response", -1, "", false)),
      "unparsable response payloads degrade observably, never throw")
  }

  test("records() explodes archives per file; poison files surface as parsed=false rows") {
    val s = spark
    import s.implicits._
    val okBlob = rec("response", "https://d.test/0", "aaaa".getBytes) ++
      rec("request", "https://d.test/1", "bb".getBytes)
    val df = Seq((1L, okBlob), (2L, "not a warc".getBytes)).toDF("file_id", "content")
    val rows = WarcOps.records(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(5), r.getBoolean(6)))
      .toSet
    assert(rows.contains((1L, 0L, "response", 4L, true)))
    assert(rows.contains((1L, 1L, "request", 2L, true)))
    assert(rows.contains((2L, -1L, "", 0L, false)), "poison archives stay observable")
    assert(rows.size == 3)
  }
}
