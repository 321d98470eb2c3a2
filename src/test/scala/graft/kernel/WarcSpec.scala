package graft.kernel

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** WARC reader/writer: ISO 28500 framing, per-record gzip members (the
  * Common Crawl layout), HTTP payload split, truncation tolerance. */
class WarcSpec extends AnyFunSuite {

  private def htmlBytes(i: Int): Array[Byte] =
    s"<html><body><p>doc $i body text</p></body></html>"
      .getBytes(StandardCharsets.UTF_8)

  private def responseRecord(i: Int): (Map[String, String], Array[Byte]) =
    (Map(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> s"https://host-$i.example/doc/$i",
      "WARC-Date" -> s"2025-01-0${i + 1}T00:00:00Z",
      "WARC-Record-ID" -> s"<urn:uuid:rec-$i>"),
      Warc.httpResponse(htmlBytes(i)))

  private val requestRecord: (Map[String, String], Array[Byte]) =
    (Map("WARC-Type" -> "request",
      "WARC-Target-URI" -> "https://host-0.example/doc/0"),
      "GET /doc/0 HTTP/1.1\r\nHost: host-0.example\r\n\r\n"
        .getBytes(StandardCharsets.US_ASCII))

  test("plain WARC round trip: framing, headers, bodies") {
    val bytes = Warc.write(Seq(responseRecord(0), requestRecord, responseRecord(1)))
    val recs = Warc.records(bytes).toVector
    assert(recs.length == 3)
    assert(recs.map(_.warcType) == Vector("response", "request", "response"))
    assert(recs(0).targetUri == "https://host-0.example/doc/0")
    assert(recs(0).dateMillis == 1735689600000L) // 2025-01-01T00:00:00Z
    assert(new String(recs(0).httpPayload, StandardCharsets.UTF_8)
      .contains("doc 0 body text"))
    // the HTTP headers are NOT part of the payload
    assert(!new String(recs(0).httpPayload, StandardCharsets.UTF_8)
      .contains("HTTP/1.1"))
  }

  test("per-record gzip members (Common Crawl layout) decompress " +
    "transparently across member boundaries") {
    val bytes = Warc.write(
      Seq(responseRecord(0), responseRecord(1), responseRecord(2)),
      gzipPerRecord = true)
    // really gzip: magic + more than one member start
    assert((bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B)
    val recs = Warc.records(bytes).toVector
    assert(recs.length == 3)
    assert(recs.map(_.targetUri).distinct.length == 3)
    assert(new String(recs(2).httpPayload, StandardCharsets.UTF_8)
      .contains("doc 2 body text"))
  }

  test("truncated / garbled tails yield the complete records, never throw") {
    val bytes = Warc.write(Seq(responseRecord(0), responseRecord(1)))
    // cut into the middle of the second record's body
    val cut = bytes.take(bytes.length - 30)
    val recs = Warc.records(cut).toVector
    assert(recs.length == 1)
    assert(recs(0).targetUri.endsWith("/doc/0"))
    // pure garbage and empty input
    assert(Warc.records("not a warc at all".getBytes).isEmpty)
    assert(Warc.records(Array.empty[Byte]).isEmpty)
    assert(Warc.records(null).isEmpty)
  }

  test("HTTP chunked transfer coding is decoded (RFC 9112 framing)") {
    val entity = "5\r\nHello\r\n7\r\n, chunk\r\n3;ext=1\r\ned!\r\n0\r\n\r\n"
      .getBytes(StandardCharsets.US_ASCII)
    val body = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n").getBytes(StandardCharsets.US_ASCII) ++ entity
    val rec = WarcRecord(Map("WARC-Type" -> "response"), body)
    assert(new String(rec.httpPayload, StandardCharsets.US_ASCII) == "Hello, chunked!")
    // malformed chunk framing falls back to the raw entity, never throws
    val bad = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZZ not chunks")
      .getBytes(StandardCharsets.US_ASCII)
    assert(new String(WarcRecord(Map.empty, bad).httpPayload)
      .contains("ZZZ not chunks"))
  }

  test("HTTP Content-Encoding: gzip entities are decompressed") {
    val html = "<html><body>compressed page text here</body></html>"
      .getBytes(StandardCharsets.UTF_8)
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(html); g.close()
      bos.toByteArray
    }
    val body = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Content-Type: text/html\r\n\r\n").getBytes(StandardCharsets.US_ASCII) ++ gz
    val rec = WarcRecord(Map("WARC-Type" -> "response"), body)
    assert(new String(rec.httpPayload, StandardCharsets.UTF_8)
      .contains("compressed page text"))
  }

  test("write round trip of a PARSED record does not duplicate " +
    "Content-Length (the writer owns it)") {
    val original = Warc.write(Seq(responseRecord(0)))
    val parsed = Warc.records(original).toVector.head
    // parsed.headers INCLUDES Content-Length; re-write with a longer body
    val rewritten = Warc.write(Seq((parsed.headers, parsed.body ++ " tail".getBytes)))
    val s = new String(rewritten, StandardCharsets.ISO_8859_1)
    val warcHead = s.substring(0, s.indexOf("\r\n\r\n")) // WARC block only
    // (the HTTP headers inside the BODY legitimately carry their own)
    assert("Content-Length".r.findAllIn(warcHead).length == 1, warcHead)
    val reparsed = Warc.records(rewritten).toVector
    assert(reparsed.length == 1)
    assert(reparsed.head.body.length == parsed.body.length + 5)
  }

  test("non-HTTP bodies pass through httpPayload unchanged") {
    val raw = (Map("WARC-Type" -> "metadata"), "key: value\n".getBytes)
    val recs = Warc.records(Warc.write(Seq(raw))).toVector
    assert(new String(recs(0).httpPayload) == "key: value\n")
  }
}
