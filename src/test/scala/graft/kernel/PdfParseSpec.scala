package graft.kernel

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Real-PDF text-layer probe: genuine %PDF-1.x bytes (Flate and plain
  * content streams, Tj and T-star operators, escapes, image XObjects)
  * through parse and end-to-end through the extraction kernel (X1→C1→P1). */
class PdfParseSpec extends AnyFunSuite {

  private val proseLines = Seq(
    "The court heard the appeal of the plaintiff and the defendant in the case.",
    "The order of the court is that the petition should proceed to law review.",
    "We find that the case has merit and the appeal is granted for this term.",
    "Each party should file with the court any other petition they have now.")

  test("writePdf produces a structurally real PDF") {
    val bytes = PdfParse.writePdf(Seq(proseLines), compress = true)
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(s.startsWith("%PDF-1.4\n"))
    assert(s.contains("/Type /Catalog") && s.contains("/Type /Pages"))
    assert(s.contains("/Filter /FlateDecode"))
    assert(s.contains("xref") && s.contains("startxref") && s.endsWith("%%EOF\n"))
    // the compressed stream must NOT contain the plaintext
    assert(!s.contains(proseLines.head))
  }

  test("parse recovers the text layer from a Flate-compressed stream") {
    val bytes = PdfParse.writePdf(Seq(proseLines), compress = true)
    val doc = PdfParse.parse(bytes)
    assert(doc.pages.length == 1)
    assert(doc.pages(0).width == 612.0 && doc.pages(0).height == 792.0)
    assert(doc.pages(0).textLayer == proseLines.mkString("\n"))
  }

  test("parse recovers text from an uncompressed stream identically") {
    val plain = PdfParse.parse(PdfParse.writePdf(Seq(proseLines), compress = false))
    val flate = PdfParse.parse(PdfParse.writePdf(Seq(proseLines), compress = true))
    assert(plain.pages(0).textLayer == flate.pages(0).textLayer)
  }

  test("literal-string escapes and octal decode like a PDF reader") {
    val lines = Seq(Seq("parens (nested) and \\ backslash", "tab\there"))
    val doc = PdfParse.parse(PdfParse.writePdf(lines, compress = false))
    assert(doc.pages(0).textLayer ==
      "parens (nested) and \\ backslash\ntab\there")
    // octal + hex string via a hand-built content stream
    val ops = "BT (A\\101\\102) Tj <48454C4C4F> Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfParse.extractTextOps(ops) == "AABHELLO")
  }

  test("multi-page PDFs parse page-by-page; image XObjects surface") {
    val p1 = Seq("page one text line")
    val p2 = Seq("page two text line")
    val bytes = PdfParse.writePdf(Seq(p1, p2), compress = true,
      images = Seq((200, 300)))
    val doc = PdfParse.parse(bytes)
    assert(doc.pages.length == 2)
    assert(doc.pages(0).textLayer == "page one text line")
    assert(doc.pages(1).textLayer == "page two text line")
    assert(doc.pages.forall(_.images.exists(i =>
      i.pixelWidth == 200 && i.pixelHeight == 300)))
  }

  test("X1→C1→P1 end-to-end: a real text PDF classifies as native text, " +
    "an image-only real PDF needs OCR") {
    val ex = new Extractor(ProbeConfig())

    val textPdf = PdfParse.writePdf(
      Seq(proseLines ++ proseLines ++ proseLines), compress = true)
    val d1 = ex.extract(textPdf)
    assert(d1.docKind == "pdf")
    assert(d1.totalPages == 1)
    assert(d1.status == "false", s"expected no OCR needed, got ${d1.status}")
    assert(d1.pages.isEmpty)
    assert(d1.extractedText.contains("the appeal of the plaintiff"))
    assert(d1.pageResults(0).pageType == "text")

    // image-only page: no content stream text, one large image XObject
    val imgPdf = PdfParse.writePdf(Seq(Seq.empty), compress = true,
      images = Seq((1200, 1600)))
    val d2 = ex.extract(imgPdf)
    assert(d2.docKind == "pdf")
    assert(d2.status == "true", s"expected OCR needed, got ${d2.status}")
    assert(d2.pages == Vector(1))
  }

  test("fuzz: mutated real-PDF bytes never escape the kernel's row " +
    "contract (valid DocExtract or error row, no exceptions)") {
    val ex = new Extractor(ProbeConfig())
    val base = PdfParse.writePdf(Seq(proseLines, proseLines), compress = true,
      images = Seq((300, 400)))
    val rng = new java.util.SplittableRandom(1234L)
    for (trial <- 0 until 200) {
      val mutated = base.clone()
      val mutations = 1 + rng.nextInt(8)
      for (_ <- 0 until mutations) {
        rng.nextInt(3) match {
          case 0 => // flip a byte
            mutated(rng.nextInt(mutated.length)) = rng.nextInt(256).toByte
          case 1 => // zero a run
            val at = rng.nextInt(mutated.length)
            val len = math.min(rng.nextInt(64), mutated.length - at)
            java.util.Arrays.fill(mutated, at, at + len, 0.toByte)
          case _ => ()
        }
      }
      // truncation variant every few trials
      val payload =
        if (trial % 5 == 0) mutated.take(1 + rng.nextInt(mutated.length)) else mutated
      val r = ex.extract(payload)
      assert(Set("html", "pdf", "error").contains(r.docKind), s"trial $trial")
      assert(Set("true", "false", "partial").contains(r.status), s"trial $trial")
      assert(r.totalPages >= 0 && r.pages.forall(_ >= 1), s"trial $trial")
    }
  }

  test("hopeless bytes fall into the error-row channel, never throw") {
    val ex = new Extractor(ProbeConfig())
    val junk = ("%PDF-1.4\ngarbage without any objects").getBytes("UTF-8")
    val d = ex.extract(junk)
    assert(d.docKind == "error")
    assert(d.status == "true") // conservative: error rows need OCR
  }
}
