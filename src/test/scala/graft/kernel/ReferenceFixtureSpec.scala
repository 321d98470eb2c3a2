package graft.kernel

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** THE reference's own fixture PDFs through OUR kernel: every assertion the
  * reference's test suite makes about its test_data PDFs
  * (tests/test_ocr_scenarios.py, test_integration.py,
  * test_base64_images.py), reproduced from the actual fixture bytes via
  * PdfParse (real %PDF parsing: page tree, Flate streams, ToUnicode CMaps)
  * and the extraction kernel — no PyMuPDF anywhere.
  *
  * Known residual (documented): the reference's comments speak of "24
  * pages" for the threshold-sensitive PDF, but its page tree carries
  * /Count 25 with 25 kids (verified byte-level) and no count is ever
  * asserted; and the "partial at 0.9" code comment is likewise never
  * asserted (the actual assert is set-membership + monotonicity, which we
  * satisfy). */
class ReferenceFixtureSpec extends AnyFunSuite {

  private val dir = "/root/reference/tests/test_data"
  private def fixture(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"$dir/$name"))

  private val scannedPdf = "2e1b63c5-761d-48b9-b3b5-f263c3db4e30.pdf"
  private val thresholdPdf = "433687b4-cd9e-4b25-b654-8b16df84ca7f.pdf"

  test("scanned fixture: all 9 pages need OCR (test_ocr_scenarios.py:22-45)") {
    val r = new Extractor(ProbeConfig()).extract(fixture(scannedPdf))
    assert(r.docKind == "pdf")
    assert(r.status == "true")
    assert(r.pages.length == 9)
    assert(r.pages == Vector(1, 2, 3, 4, 5, 6, 7, 8, 9))
  }

  test("threshold-sensitive fixture: status 'false', empty pages at the " +
    "default threshold (test_ocr_scenarios.py:47-67, 174-190)") {
    val r = new Extractor(ProbeConfig()).extract(fixture(thresholdPdf))
    assert(r.docKind == "pdf")
    assert(r.status == "false", s"got ${r.status}")
    assert(r.pages.isEmpty)
    // the page TREE carries /Count 25 (the reference's "24 pages" comment
    // is stale and never asserted)
    assert(r.totalPages == 25)
  }

  test("threshold behaviors: distinct statuses incl. 'true'; low threshold " +
    "stays 'false' (test_ocr_scenarios.py:69-95)") {
    val statuses = Set(
      new Extractor(ProbeConfig()).extract(fixture(scannedPdf)).status,
      new Extractor(ProbeConfig(confidenceThreshold = 0.1))
        .extract(fixture(thresholdPdf)).status,
      new Extractor(ProbeConfig(confidenceThreshold = 0.9))
        .extract(fixture(thresholdPdf)).status)
    assert(statuses.contains("true"))
    assert(statuses.size >= 2)
    assert(new Extractor(ProbeConfig(confidenceThreshold = 0.1))
      .extract(fixture(thresholdPdf)).status == "false")
  }

  test("confidence-threshold monotonicity on the real fixture: higher " +
    "threshold ⇒ same or more pages (test_ocr_scenarios.py:139-161)") {
    val low = new Extractor(ProbeConfig(confidenceThreshold = 0.1))
      .extract(fixture(thresholdPdf))
    val high = new Extractor(ProbeConfig(confidenceThreshold = 0.9))
      .extract(fixture(thresholdPdf))
    assert(high.pages.length >= low.pages.length)
    assert(Set("true", "false", "partial").contains(low.status))
    assert(Set("true", "false", "partial").contains(high.status))
  }

  test("deterministic re-extraction (the parallel≡sequential contract, " +
    "test_ocr_scenarios.py:117-137)") {
    val a = new Extractor(ProbeConfig()).extract(fixture(scannedPdf))
    val b = new Extractor(ProbeConfig()).extract(fixture(scannedPdf))
    assert(a.status == b.status && a.pages == b.pages)
  }

  test("include_images contract on the scanned fixture " +
    "(test_base64_images.py:15-66)") {
    val r = new Extractor(ProbeConfig(includeImages = true, imageDpi = 72))
      .extract(fixture(scannedPdf))
    // page images exactly for the OCR-needing pages, 1-indexed
    assert(r.pageImages.keySet == r.pages.toSet)
    assert(r.pageImages.keySet.forall(_ > 0))
    r.pageImages.values.foreach { b64 =>
      assert(b64.nonEmpty)
      assert(b64.startsWith("iVBORw0KGgo") || b64.length > 100)
    }
    // include_images=False → none
    val r2 = new Extractor(ProbeConfig(includeImages = false))
      .extract(fixture(scannedPdf))
    assert(r2.pageImages.isEmpty)
  }

  test("dpi settings: statuses/pages unchanged, image payloads comparable " +
    "(test_base64_images.py:140-164)") {
    val low = new Extractor(ProbeConfig(includeImages = true, imageDpi = 72))
      .extract(fixture(scannedPdf))
    val high = new Extractor(ProbeConfig(includeImages = true, imageDpi = 200))
      .extract(fixture(scannedPdf))
    assert(low.status == high.status)
    assert(low.pages == high.pages)
    low.pageImages.keySet.intersect(high.pageImages.keySet).foreach { p =>
      assert(high.pageImages(p).length >= (low.pageImages(p).length * 0.8).toInt)
    }
  }

  test("remaining fixture PDFs parse and classify without error " +
    "(test_integration.py:157-170)") {
    for (f <- Seq("44abcd07-58ab-4957-a66b-c03e82e11e6f.pdf",
      "e59a8fba-a718-4065-a68a-90ab194cbfb3.pdf")) {
      val r = new Extractor(ProbeConfig()).extract(fixture(f))
      assert(r.docKind == "pdf", s"$f kind=${r.docKind} err=${r.error}")
      assert(Set("true", "false", "partial").contains(r.status))
      assert(r.pages.forall(_ > 0))
      assert(r.totalPages > 0)
    }
  }
}
