package graft.kernel

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable

/** Minimal REAL-PDF text-layer probe — genuine `%PDF-1.x` byte streams,
  * no external library (java.util.zip only).
  *
  * Scope (documented, fixture-tested): PDF 1.x files whose page text lives
  * in uncompressed or FlateDecode content streams as literal-string
  * `Tj` / `'` / `TJ` show operators (the dominant shape for digitally-born
  * single-font documents). Covered:
  *   - object scan (`N 0 obj … endobj`) without requiring a valid xref —
  *     robust to appended/incremental files;
  *   - `/Type /Page` objects with `/MediaBox` geometry and `/Contents`
  *     references (single ref or array);
  *   - `/Filter /FlateDecode` stream inflation (zlib);
  *   - literal strings with the standard escapes (\\ \( \) \n \r \t \b \f,
  *     octal \ddd) and hex strings `<…>`;
  *   - line structure: `T*`, `'`, and `Td`/`TD` with a negative y start a
  *     new line, matching how text extractors linearize simple layouts;
  *   - image XObjects (`/Subtype /Image`, `/Width`, `/Height`) attached to
  *     the page via its `/Resources /XObject` dict.
  * Everything else (CID fonts, encrypted files, object streams, non-Flate
  * filters) is out of scope: pages parse with an empty text layer and flow
  * down the SAME needs-OCR path the reference takes for image-only pages
  * (_detector.py:336-423) — degraded, never wrong-kind. The parsed result
  * feeds the existing PdfDoc model, so X1→C1→P1 run unchanged on real PDF
  * bytes (PdfProbeSpec drives a hand-assembled fixture end-to-end).
  */
object PdfParse {

  private val Header = "%PDF-".getBytes(StandardCharsets.US_ASCII)

  def isRealPdf(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= Header.length &&
      java.util.Arrays.equals(bytes, 0, Header.length, Header, 0, Header.length)

  // ---------------------------------------------------------------- parsing

  /** Parse a real PDF byte stream into the probe's PdfDoc model. Throws on
    * structurally hopeless input (no page objects) — the Extractor maps
    * that to its error-row channel. */
  def parse(bytes: Array[Byte]): PdfDoc = {
    val raw = new String(bytes, StandardCharsets.ISO_8859_1) // byte-faithful
    val objs = scanObjects(raw)

    val pageObjs = objs.filter { case (_, body) => isPageObject(body) }
    require(pageObjs.nonEmpty, "no /Type /Page objects found")

    val pages = pageObjs.toVector.sortBy(_._1).map { case (_, body) =>
      val (w, h) = mediaBox(body).getOrElse((612.0, 792.0))
      val text = contentsRefs(body)
        .flatMap(objs.get)
        .map(streamData(_, bytes, raw))
        .collect { case Some(data) => extractTextOps(data) }
        .mkString("\n")
      val images = xobjectImages(body, objs)
      PdfPage(w, h, text, altTextLayer = None, images)
    }
    PdfDoc(pages)
  }

  /** All `N 0 obj … endobj` bodies keyed by object number (generation
    * ignored — last definition wins, like incremental-update semantics). */
  private def scanObjects(raw: String): Map[Int, String] = {
    val objPat = Py.re("""(\d+)\s+\d+\s+obj""")
    val m = objPat.matcher(raw)
    val out = mutable.Map[Int, String]()
    while (m.find()) {
      val num = m.group(1).toInt
      val end = raw.indexOf("endobj", m.end())
      if (end >= 0) out(num) = raw.substring(m.end(), end)
    }
    out.toMap
  }

  private def isPageObject(body: String): Boolean =
    Py.re("""/Type\s*/Page(?![a-zA-Z])""").matcher(body).find()

  private def mediaBox(body: String): Option[(Double, Double)] = {
    val p = Py.re(
      """/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]""")
    val m = p.matcher(body)
    if (m.find())
      Some((m.group(3).toDouble - m.group(1).toDouble,
        m.group(4).toDouble - m.group(2).toDouble))
    else None
  }

  /** Object numbers referenced by /Contents (single `N 0 R` or array). */
  private def contentsRefs(body: String): Vector[Int] = {
    val single = Py.re("""/Contents\s+(\d+)\s+\d+\s+R""")
    val arr = Py.re("""/Contents\s*\[([^\]]*)\]""")
    val sm = single.matcher(body)
    if (sm.find()) Vector(sm.group(1).toInt)
    else {
      val am = arr.matcher(body)
      if (am.find()) {
        val refPat = Py.re("""(\d+)\s+\d+\s+R""")
        val rm = refPat.matcher(am.group(1))
        val refs = Vector.newBuilder[Int]
        while (rm.find()) refs += rm.group(1).toInt
        refs.result()
      } else Vector.empty
    }
  }

  /** Decode an object's stream payload: locate `stream…endstream` within
    * the ORIGINAL bytes (binary-safe) and inflate if FlateDecode. */
  private def streamData(
      objBody: String, bytes: Array[Byte], raw: String): Option[Array[Byte]] = {
    val bodyStart = raw.indexOf(objBody)
    if (bodyStart < 0) return None
    val streamKw = raw.indexOf("stream", bodyStart)
    if (streamKw < 0 || streamKw > bodyStart + objBody.length) return None
    var dataStart = streamKw + "stream".length
    if (dataStart < raw.length && raw.charAt(dataStart) == '\r') dataStart += 1
    if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
    val dataEnd = raw.indexOf("endstream", dataStart)
    if (dataEnd < 0) return None
    var trimmedEnd = dataEnd
    if (trimmedEnd > dataStart && raw.charAt(trimmedEnd - 1) == '\n') trimmedEnd -= 1
    if (trimmedEnd > dataStart && raw.charAt(trimmedEnd - 1) == '\r') trimmedEnd -= 1
    val data = java.util.Arrays.copyOfRange(bytes, dataStart, trimmedEnd)
    if (Py.re("""/Filter\s*/FlateDecode""").matcher(objBody).find())
      inflate(data)
    else Some(data)
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return Some(out.toByteArray)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  /** Extract show-operator text from one decoded content stream. */
  private[kernel] def extractTextOps(data: Array[Byte]): String = {
    val s = new String(data, StandardCharsets.ISO_8859_1)
    val sb = new StringBuilder
    var i = 0
    var lineOpen = false
    def newline(): Unit = {
      if (lineOpen) { sb.append('\n'); lineOpen = false }
    }
    while (i < s.length) {
      s.charAt(i) match {
        case '(' =>
          val (str, next) = literalString(s, i)
          sb.append(str); lineOpen = true
          i = next
        case '<' if i + 1 < s.length && s.charAt(i + 1) != '<' =>
          val (str, next) = hexString(s, i)
          sb.append(str); lineOpen = true
          i = next
        case 'T' if i + 1 < s.length && (s.charAt(i + 1) == '*') =>
          newline(); i += 2
        case 'T' if i + 1 < s.length &&
          (s.charAt(i + 1) == 'd' || s.charAt(i + 1) == 'D') =>
          // Td/TD moved the cursor; the operands PRECEDE the operator — a
          // negative y operand means a new line. Look back for the y value.
          if (precedingYNegative(s, i)) newline()
          i += 2
        case '\'' =>
          newline(); i += 1
        case _ => i += 1
      }
    }
    sb.toString
  }

  private def precedingYNegative(s: String, opIdx: Int): Boolean = {
    var j = opIdx - 1
    while (j >= 0 && (s.charAt(j) == ' ' || s.charAt(j) == '\n' || s.charAt(j) == '\r')) j -= 1
    val end = j + 1
    while (j >= 0 && "0123456789.+-".indexOf(s.charAt(j)) >= 0) j -= 1
    val tok = s.substring(j + 1, end)
    tok.nonEmpty && (try tok.toDouble < 0 catch { case _: Exception => false })
  }

  /** PDF literal string starting at '(' — returns (decoded, indexAfter). */
  private[kernel] def literalString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case d if d >= '0' && d <= '7' =>
              var k = i + 1; var v = 0; var n = 0
              while (k < s.length && n < 3 && s.charAt(k) >= '0' && s.charAt(k) <= '7') {
                v = v * 8 + (s.charAt(k) - '0'); k += 1; n += 1
              }
              sb.append(v.toChar); i = k
            case '\n' => i += 2 // line continuation
            case other => sb.append(other); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case c => sb.append(c); i += 1
      }
    }
    (sb.toString, i)
  }

  /** PDF hex string starting at '<' — returns (decoded, indexAfter). */
  private[kernel] def hexString(s: String, start: Int): (String, Int) = {
    val end0 = s.indexOf('>', start)
    val end = if (end0 < 0) s.length else end0
    val hex = s.substring(start + 1, end).filterNot(_.isWhitespace)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val sb = new StringBuilder
    var i = 0
    while (i + 1 < padded.length + 1 && i + 2 <= padded.length) {
      try sb.append(Integer.parseInt(padded.substring(i, i + 2), 16).toChar)
      catch { case _: Exception => }
      i += 2
    }
    (sb.toString, math.min(end + 1, s.length))
  }

  /** Image XObjects reachable from the page's /Resources. */
  private def xobjectImages(
      pageBody: String, objs: Map[Int, String]): Vector[PdfImage] = {
    val xobjRefPat = Py.re("""/XObject\s*<<([^>]*)>>""")
    val m = xobjRefPat.matcher(pageBody)
    val refBodies: Vector[String] =
      if (m.find()) {
        val refPat = Py.re("""(\d+)\s+\d+\s+R""")
        val rm = refPat.matcher(m.group(1))
        val refs = Vector.newBuilder[String]
        while (rm.find()) objs.get(rm.group(1).toInt).foreach(refs += _)
        refs.result()
      } else Vector.empty
    refBodies.flatMap { body =>
      if (Py.re("""/Subtype\s*/Image""").matcher(body).find()) {
        val wPat = Py.re("""/Width\s+(\d+)""")
        val hPat = Py.re("""/Height\s+(\d+)""")
        val wm = wPat.matcher(body); val hm = hPat.matcher(body)
        if (wm.find() && hm.find()) {
          val w = wm.group(1).toInt; val h = hm.group(1).toInt
          // placement unknown without full graphics-state tracking: use a
          // centered nominal rect at intrinsic size (bounded by the page)
          Some(PdfImage(w, h, Vector(PdfRect(0, 0, w.toDouble, h.toDouble)),
            Array.empty[Byte]))
        } else None
      } else None
    }
  }

  // --------------------------------------------------------------- writing

  /** Assemble a minimal REAL PDF: catalog → pages → N pages, each with a
    * (optionally Flate-compressed) content stream showing `lines` via
    * Tj/T*, plus optional image XObjects. Produces a structurally valid
    * file (header, objects, xref table, trailer) that external readers
    * accept. Used by fixtures and the synthetic corpus. */
  def writePdf(
      pageLines: Seq[Seq[String]],
      compress: Boolean = true,
      images: Seq[(Int, Int)] = Seq.empty,
      pageWidth: Double = 612,
      pageHeight: Double = 792): Array[Byte] = {
    val objects = mutable.ArrayBuffer[Array[Byte]]() // 1-indexed bodies
    def obj(n: Int, body: String): Array[Byte] =
      s"$n 0 obj\n$body\nendobj\n".getBytes(StandardCharsets.ISO_8859_1)

    val nPages = pageLines.length
    val imgObjBase = 3 + 2 * nPages
    // 1: catalog, 2: pages, then per page i: (3+2i): page, (4+2i): content
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    objects += obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    objects += obj(2, s"<< /Type /Pages /Kids [$kids] /Count $nPages >>")

    val imgRefs =
      if (images.nonEmpty)
        " /Resources << /XObject << " +
          images.indices.map(j => s"/Im$j ${imgObjBase + j} 0 R").mkString(" ") +
          " >> >>"
      else ""

    pageLines.zipWithIndex.foreach { case (lines, i) =>
      val pageNum = 3 + 2 * i
      val contNum = 4 + 2 * i
      objects += obj(pageNum,
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $pageWidth $pageHeight] " +
          s"/Contents $contNum 0 R$imgRefs >>")
      val ops = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, li) =>
        val esc = line.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        if (li > 0) ops.append("T*\n")
        ops.append(s"($esc) Tj\n")
      }
      ops.append("ET\n")
      val rawOps = ops.toString.getBytes(StandardCharsets.ISO_8859_1)
      val (data, filter) =
        if (compress) (deflate(rawOps), " /Filter /FlateDecode") else (rawOps, "")
      val head = s"$contNum 0 obj\n<< /Length ${data.length}$filter >>\nstream\n"
        .getBytes(StandardCharsets.ISO_8859_1)
      val tail = "\nendstream\nendobj\n".getBytes(StandardCharsets.ISO_8859_1)
      objects += (head ++ data ++ tail)
    }

    images.zipWithIndex.foreach { case ((w, h), j) =>
      val body =
        s"<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
          "/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 0 >>\nstream\n\nendstream"
      objects += obj(imgObjBase + j, body)
    }

    // assemble with a real xref table
    val out = new ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes(StandardCharsets.ISO_8859_1))
    val offsets = mutable.ArrayBuffer[Int]()
    objects.foreach { o => offsets += out.size(); out.write(o) }
    val xrefPos = out.size()
    val xref = new StringBuilder(s"xref\n0 ${objects.length + 1}\n")
    xref.append("0000000000 65535 f \n")
    offsets.foreach(o => xref.append(f"$o%010d 00000 n \n"))
    xref.append(s"trailer\n<< /Size ${objects.length + 1} /Root 1 0 R >>\n")
    xref.append(s"startxref\n$xrefPos\n%%EOF\n")
    out.write(xref.toString.getBytes(StandardCharsets.ISO_8859_1))
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }
}
