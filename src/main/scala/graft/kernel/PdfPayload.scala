package graft.kernel

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

/** Deterministic PDF-like payload model.
  *
  * No JVM PDF parser ships offline (SURVEY.md §7.1), so "PDF" payloads in the
  * Page table are a structured binary format carrying exactly the features
  * the reference's probe consumes (_detector.py:336-423, 732-803): per page a
  * text layer (the PyMuPDF/"fitz" view), an optional alternate text layer
  * (the pdfplumber view, exercising the dual-extractor strategies of
  * _detector.py:250-296), page geometry, and embedded images with pixel
  * dimensions + placement rectangles. Decision-function parity with the
  * reference is at feature level; real-PDF binary parsing is explicitly out
  * of scope (FIXTURES.md §3).
  */
final case class PdfRect(x0: Double, y0: Double, x1: Double, y1: Double) {
  def width: Double = x1 - x0
  def height: Double = y1 - y0
  def area: Double = width * height
}

/** One embedded image: intrinsic pixel dims, placement rects on the page,
  * and optional stored bytes (the reuse target of _detector.py:117-182).
  * `headerMismatch` marks a payload whose OWN header (JPEG SOF / JBIG2
  * page info) disagrees with the XObject dict's /Width /Height — the
  * malformed-scanned-PDF signature; such bytes are never reused (data is
  * emptied) and the page carries an error detail. Not serialized
  * (GFTPDF1 payloads are feature-level; only real-PDF parses set it). */
final case class PdfImage(
    pixelWidth: Int,
    pixelHeight: Int,
    rects: Vector[PdfRect],
    data: Array[Byte],
    headerMismatch: Boolean = false,
    // data is a raw CCITT G4 bitstream (/Filter /CCITTFaxDecode, /K -1):
    // decodable via CcittG4.decode with the dict dims, but NOT a
    // self-contained image — S6 reuse must not return it verbatim
    ccittG4: Boolean = false,
    // data is a PDF-embedded JBIG2 segment stream (/Filter /JBIG2Decode):
    // self-describing (page-info dims), decodable via Jbig2.decode, but
    // like G4 not a standalone image container — no verbatim S6 reuse
    jbig2: Boolean = false)

final case class PdfPage(
    width: Double,
    height: Double,
    textLayer: String,
    altTextLayer: Option[String],
    images: Vector[PdfImage],
    // Positioned show-strings (x, y, text) in PDF user space (baseline-
    // left, y up, points) — populated by PdfParse's geometric pass on REAL
    // PDFs so S5 rasters can place ink Td/Tm-exactly; empty for structured
    // payloads (not serialized: GFTPDF1 carries feature-level data only).
    posRuns: Vector[(Double, Double, String)] = Vector.empty)

final case class PdfDoc(pages: Vector[PdfPage])

object PdfPayload {
  /** 8-byte magic distinguishing PDF-like payloads from raw HTML bytes. */
  val Magic: Array[Byte] = "GFTPDF1\n".getBytes(StandardCharsets.US_ASCII)

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= Magic.length &&
      java.util.Arrays.equals(bytes, 0, Magic.length, Magic, 0, Magic.length)

  def serialize(doc: PdfDoc): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(Magic)
    val out = new DataOutputStream(bos)
    out.writeInt(doc.pages.length)
    doc.pages.foreach { p =>
      out.writeDouble(p.width)
      out.writeDouble(p.height)
      writeStr(out, p.textLayer)
      out.writeBoolean(p.altTextLayer.isDefined)
      p.altTextLayer.foreach(writeStr(out, _))
      out.writeInt(p.images.length)
      p.images.foreach { img =>
        out.writeInt(img.pixelWidth)
        out.writeInt(img.pixelHeight)
        out.writeInt(img.rects.length)
        img.rects.foreach { r =>
          out.writeDouble(r.x0); out.writeDouble(r.y0)
          out.writeDouble(r.x1); out.writeDouble(r.y1)
        }
        out.writeInt(img.data.length)
        out.write(img.data)
      }
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): PdfDoc = {
    require(isPdf(bytes), "not a GFTPDF1 payload")
    val in = new DataInputStream(
      new ByteArrayInputStream(bytes, Magic.length, bytes.length - Magic.length))
    val nPages = in.readInt()
    val pages = Vector.fill(nPages) {
      val w = in.readDouble(); val h = in.readDouble()
      val text = readStr(in)
      val alt = if (in.readBoolean()) Some(readStr(in)) else None
      val nImages = in.readInt()
      val images = Vector.fill(nImages) {
        val pw = in.readInt(); val ph = in.readInt()
        val nRects = in.readInt()
        val rects = Vector.fill(nRects)(
          PdfRect(in.readDouble(), in.readDouble(), in.readDouble(), in.readDouble()))
        val dataLen = in.readInt()
        val data = new Array[Byte](dataLen)
        in.readFully(data)
        PdfImage(pw, ph, rects, data)
      }
      PdfPage(w, h, text, alt, images)
    }
    PdfDoc(pages)
  }

  private def writeStr(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    out.writeInt(b.length)
    out.write(b)
  }

  private def readStr(in: DataInputStream): String = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    new String(b, StandardCharsets.UTF_8)
  }
}
