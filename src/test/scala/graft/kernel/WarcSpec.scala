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

  test("non-HTTP bodies pass through httpPayload unchanged") {
    val raw = (Map("WARC-Type" -> "metadata"), "key: value\n".getBytes)
    val recs = Warc.records(Warc.write(Seq(raw))).toVector
    assert(new String(recs(0).httpPayload) == "key: value\n")
  }
}
