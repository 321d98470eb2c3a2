package graft.kernel

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** One WARC record: raw header map (original-case keys preserved, lookups
  * case-insensitive per the spec) and the record body bytes. */
final case class WarcRecord(headers: Map[String, String], body: Array[Byte]) {
  private def h(name: String): Option[String] =
    headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
  def warcType: String = h("WARC-Type").getOrElse("")
  def targetUri: String = h("WARC-Target-URI").getOrElse("")
  /** WARC-Date (ISO-8601) as epoch millis; 0 when absent/malformed. */
  def dateMillis: Long =
    try h("WARC-Date").map(java.time.Instant.parse(_).toEpochMilli).getOrElse(0L)
    catch { case _: Exception => 0L }

  /** For `response` records the body is an HTTP message: strip the status
    * line + headers (terminated by CRLFCRLF) and return the DECODED entity
    * bytes — `Transfer-Encoding: chunked` is de-chunked and
    * `Content-Encoding: gzip` is decompressed (both routine in real
    * Common Crawl captures; handing them through raw would feed chunk-size
    * lines or deflate bytes to the HTML kernel). Malformed encodings fall
    * back to the undecoded entity. Non-HTTP bodies are returned as-is. */
  def httpPayload: Array[Byte] = {
    if (body.length < 5 ||
      !new String(body, 0, 5, StandardCharsets.US_ASCII).startsWith("HTTP/"))
      return body
    var i = 0
    while (i + 3 < body.length) {
      if (body(i) == '\r' && body(i + 1) == '\n' &&
        body(i + 2) == '\r' && body(i + 3) == '\n') {
        val head = new String(body, 0, i, StandardCharsets.ISO_8859_1)
          .toLowerCase
        var entity = java.util.Arrays.copyOfRange(body, i + 4, body.length)
        if (head.contains("transfer-encoding: chunked"))
          entity = Warc.dechunk(entity).getOrElse(entity)
        if (head.contains("content-encoding: gzip"))
          entity = Warc.gunzip(entity).getOrElse(entity)
        return entity
      }
      i += 1
    }
    body
  }
}

/** WARC (ISO 28500) reader/writer — pure JVM, the on-disk format of
  * Common-Crawl-style web corpora. Reads both plain and gzip WARCs;
  * Common Crawl gzips PER RECORD (each record its own gzip member), which
  * `GZIPInputStream` decompresses transparently across member boundaries,
  * so one sequential pass covers both layouts. Malformed trailing bytes
  * end iteration instead of throwing (a truncated fetch yields the records
  * it has, per the error-row philosophy of the pipeline). */
object Warc {

  private val GzipMagic = Array(0x1F.toByte, 0x8B.toByte)

  /** Lazily parse all records of a WARC byte stream (plain or gzip). */
  def records(bytes: Array[Byte]): Iterator[WarcRecord] = {
    if (bytes == null || bytes.length < 4) return Iterator.empty
    val in: InputStream =
      if (bytes(0) == GzipMagic(0) && bytes(1) == GzipMagic(1))
        new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
      else new ByteArrayInputStream(bytes)
    recordIterator(in)
  }

  private def recordIterator(in: InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false
      private def advance(): Unit = {
        if (done || nextRec != null) return
        try {
          nextRec = readOne(in).orNull
          if (nextRec == null) done = true
        } catch {
          case _: Exception => done = true // truncated/garbled tail
        }
      }
      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): WarcRecord = {
        advance()
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }

  /** Read one record at the stream position: version line, header lines
    * to the blank line, Content-Length body bytes, trailing CRLFCRLF. */
  private def readOne(in: InputStream): Option[WarcRecord] = {
    var line = readLine(in)
    // tolerate inter-record padding
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return None
    if (!line.startsWith("WARC/")) return None
    val headers = Map.newBuilder[String, String]
    var l = readLine(in)
    while (l != null && l.nonEmpty) {
      val c = l.indexOf(':')
      if (c > 0) headers += (l.substring(0, c).trim -> l.substring(c + 1).trim)
      l = readLine(in)
    }
    val hmap = headers.result()
    val len = hmap.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Content-Length") => v.toLong
    }.getOrElse(0L)
    if (len < 0 || len > Int.MaxValue) return None
    val body = new Array[Byte](len.toInt)
    var off = 0
    while (off < body.length) {
      val n = in.read(body, off, body.length - off)
      if (n < 0) throw new EOFException("truncated WARC body")
      off += n
    }
    Some(WarcRecord(hmap, body))
  }

  /** One header line (CRLF or LF terminated, terminator stripped); null at
    * end of stream. */
  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  /** Decode an HTTP/1.1 chunked transfer coding (RFC 9112 §7.1): hex
    * chunk-size lines (extensions after ';' ignored), CRLF-framed data,
    * terminated by a zero-size chunk. None on malformed framing. */
  private[kernel] def dechunk(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val out = new ByteArrayOutputStream(data.length)
      var i = 0
      while (i < data.length) {
        val lineEnd = indexOfCrlf(data, i)
        if (lineEnd < 0) return None
        val sizeLine = new String(data, i, lineEnd - i, StandardCharsets.US_ASCII)
        val hex = sizeLine.takeWhile(c => c != ';').trim
        val size = java.lang.Integer.parseInt(hex, 16)
        if (size < 0) return None
        if (size == 0) return Some(out.toByteArray) // last-chunk (trailers ignored)
        val dataStart = lineEnd + 2
        if (dataStart + size > data.length) return None
        out.write(data, dataStart, size)
        i = dataStart + size + 2 // skip the chunk's trailing CRLF
      }
      None // missing last-chunk
    } catch { case _: Exception => None }
  }

  private def indexOfCrlf(data: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < data.length) {
      if (data(i) == '\r' && data(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Tolerant gunzip (Content-Encoding: gzip entities). */
  private[kernel] def gunzip(data: Array[Byte]): Option[Array[Byte]] = {
    if (data.length < 2 || data(0) != GzipMagic(0) || data(1) != GzipMagic(1))
      return None
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(data), 1 << 16)
      val out = new ByteArrayOutputStream(data.length * 3)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  // --------------------------------------------------------------- writing

  /** Assemble a WARC file from (headers, body) records — used by fixtures
    * and the synthetic corpus. `gzipPerRecord` mirrors Common Crawl's
    * layout: each record is an independent gzip member. */
  def write(
      records: Seq[(Map[String, String], Array[Byte])],
      gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { case (headers, body) =>
      val rec = new ByteArrayOutputStream()
      val crlf = "\r\n"
      val head = new StringBuilder("WARC/1.0").append(crlf)
      // the writer owns Content-Length (it must match THIS body) — a
      // caller-supplied one (e.g. round-tripping a parsed record whose
      // header map includes it) would duplicate/conflict and desync readers
      headers.filterNot(_._1.equalsIgnoreCase("Content-Length"))
        .foreach { case (k, v) => head.append(s"$k: $v").append(crlf) }
      head.append(s"Content-Length: ${body.length}").append(crlf).append(crlf)
      rec.write(head.toString.getBytes(StandardCharsets.US_ASCII))
      rec.write(body)
      rec.write(s"$crlf$crlf".getBytes(StandardCharsets.US_ASCII))
      if (gzipPerRecord) {
        val gz = new GZIPOutputStream(out)
        gz.write(rec.toByteArray)
        gz.finish()
        gz.close() // releases the native Deflater NOW (close of the
        // underlying ByteArrayOutputStream is a no-op) — this runs once
        // per record in the WET sink, so GC-deferred release would accrue
        // unbounded off-heap buffers
      } else out.write(rec.toByteArray)
    }
    out.toByteArray
  }

  /** An HTTP/1.1 200 response wrapper for an html payload (the body shape
    * of a CC `response` record). */
  def httpResponse(html: Array[Byte], contentType: String = "text/html"): Array[Byte] = {
    val head = (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${html.length}\r\n\r\n").getBytes(StandardCharsets.US_ASCII)
    head ++ html
  }
}
