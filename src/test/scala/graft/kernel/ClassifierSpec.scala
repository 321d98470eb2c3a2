package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** C1–C4 + P1 boundary tests — thresholds straight from SURVEY.md §2.9 and
  * the cited reference lines (_detector.py:816-919, :425-510,
  * simple.py:121-158). */
class ClassifierSpec extends AnyFunSuite {

  private def metrics(quality: Double, density: Double): TextMetrics =
    TextMetrics(0, 0, 0, 0.0, hasStructuredContent = false, 0, 0, 0,
      quality, density, 0.0)

  test("C1 empty page: len<10 and no images → EMPTY 0.95") {
    assert(Classifier.classifyEnhanced(0, 0, 9, 0, metrics(0, 0), 0) == (PageType.Empty, 0.95))
    // len 10 is NOT empty (strict <10)
    assert(Classifier.classifyEnhanced(0, 0, 10, 0, metrics(0, 0), 0) != ((PageType.Empty, 0.95)))
  }

  test("C1 high-quality long text, background image → TEXT, conf 0.7+0.3q capped 0.9") {
    val (t, c) = Classifier.classifyEnhanced(0.5, 0.0, 300, 0, metrics(0.7, 0.5), 0.6)
    assert(t == PageType.Text)
    assert(c == math.min(0.9, 0.7 + 0.7 * 0.3))
  }

  test("C1 high-quality long text, ≤2 content images → TEXT 0.8+0.2q capped 0.95") {
    val (t, c) = Classifier.classifyEnhanced(0.5, 0.1, 300, 2, metrics(0.8, 0.5), 0.0)
    assert(t == PageType.Text && c == math.min(0.95, 0.8 + 0.8 * 0.2))
  }

  test("C1 high-quality long text, >2 content images → MIXED") {
    val (t, c) = Classifier.classifyEnhanced(0.5, 0.3, 300, 3, metrics(0.8, 0.5), 0.0)
    assert(t == PageType.Mixed && c == math.min(0.85, 0.7 + 0.8 * 0.2))
  }

  test("C1 moderate quality or very long → TEXT/MIXED by image count") {
    val (t1, c1) = Classifier.classifyEnhanced(0, 0, 300, 1, metrics(0.5, 0.2), 0)
    assert(t1 == PageType.Text && c1 == 0.6 + 0.5 * 0.2)
    val (t2, c2) = Classifier.classifyEnhanced(0, 0, 600, 2, metrics(0.1, 0.2), 0)
    assert(t2 == PageType.Mixed && c2 == 0.6 + 0.1 * 0.15)
  }

  test("C1 fall-through: 200<len≤500, quality≤0.4 → MIXED 0.5 fallback") {
    assert(Classifier.classifyEnhanced(0, 0, 300, 0, metrics(0.4, 0.9), 0) == (PageType.Mixed, 0.5))
    assert(Classifier.classifyEnhanced(0, 0, 500, 0, metrics(0.2, 0.1), 0) == (PageType.Mixed, 0.5))
    // len 501 escapes the fallback via `or text_length > 500`
    assert(Classifier.classifyEnhanced(0, 0, 501, 0, metrics(0.2, 0.1), 0) == (PageType.Text, 0.6 + 0.2 * 0.2))
  }

  test("C1 moderate text 50..200") {
    assert(Classifier.classifyEnhanced(0, 0, 100, 1, metrics(0.6, 0), 0) == (PageType.Text, 0.7))
    assert(Classifier.classifyEnhanced(0, 0.5, 100, 0, metrics(0.2, 0), 0) == (PageType.Mixed, 0.65))
    assert(Classifier.classifyEnhanced(0, 0, 100, 3, metrics(0.2, 0), 0) == (PageType.Mixed, 0.65))
    assert(Classifier.classifyEnhanced(0, 0, 100, 2, metrics(0.2, 0), 0) == (PageType.Text, 0.6))
  }

  test("C1 low text → SCANNED by images, else EMPTY 0.8") {
    val (t, c) = Classifier.classifyEnhanced(0, 0.5, 20, 1, metrics(0, 0), 0)
    assert(t == PageType.Scanned && c == math.min(0.9, 0.6 + 0.5 * 0.4))
    assert(Classifier.classifyEnhanced(0, 0.21, 20, 0, metrics(0, 0), 0)._1 == PageType.Scanned)
    assert(Classifier.classifyEnhanced(0, 0.2, 20, 0, metrics(0, 0), 0) == (PageType.Empty, 0.8))
    // len in [10,50) with no images → EMPTY 0.8 (not the 0.95 branch)
    assert(Classifier.classifyEnhanced(0, 0, 30, 0, metrics(0, 0), 0) == (PageType.Empty, 0.8))
  }

  test("C2 legacy classifier branches (_detector.py:881-919)") {
    assert(Classifier.classifyLegacy(0.0, 0.0, 5, 0) == (PageType.Empty, 0.95))
    assert(Classifier.classifyLegacy(0.3, 0.1, 600, 0) == (PageType.Text, math.min(0.9, 0.7 + 0.3 * 0.5)))
    assert(Classifier.classifyLegacy(0.3, 0.3, 600, 0) == (PageType.Mixed, math.min(0.85, 0.6 + 0.3 * 0.3)))
    assert(Classifier.classifyLegacy(0.0, 0.5, 20, 1) == (PageType.Scanned, math.min(0.9, 0.6 + 0.5 * 0.4)))
    assert(Classifier.classifyLegacy(0.0, 0.5, 100, 0) == (PageType.Mixed, 0.7))
    assert(Classifier.classifyLegacy(0.06, 0.1, 100, 0) == (PageType.Text, 0.75))
    assert(Classifier.classifyLegacy(0.01, 0.1, 100, 0) == (PageType.Scanned, 0.6))
    assert(Classifier.classifyLegacy(0.2, 0.1, 5, 1) == (PageType.Text, 0.5 + 0.2))
    assert(Classifier.classifyLegacy(0.1, 0.2, 5, 1) == (PageType.Scanned, 0.5 + 0.2))
  }

  test("C3 fast classifier chain (_detector.py:471-487)") {
    assert(Classifier.classifyFast(5, 0, 0.0, 0.0) == (PageType.Empty, 0.9))
    assert(Classifier.classifyFast(600, 0, 0.2, 0.0) == (PageType.Text, 0.8))
    assert(Classifier.classifyFast(20, 2, 0.0, 0.4) == (PageType.Scanned, 0.8))
    assert(Classifier.classifyFast(100, 1, 0.0, 0.2) == (PageType.Mixed, 0.7))
    // exactly 50 chars with images: neither <50 nor >50 → uncertain branch
    assert(Classifier.classifyFast(50, 1, 0.0, 0.2) == (PageType.Scanned, 0.5))
    assert(Classifier.classifyFast(300, 0, 0.05, 0.0) == (PageType.Text, 0.5))
    assert(Classifier.classifyFast(100, 0, 0.0, 0.2) == (PageType.Scanned, 0.5))
  }

  test("fast estimates (_detector.py:450-469)") {
    assert(Classifier.fastEstimates(0, 1000, 0) == (0.0, 0.0))
    assert(Classifier.fastEstimates(100, 1000, 5) == (math.min(1.0, 100 * 100.0 / 1000), math.min(0.8, 5 * 0.2)))
  }

  test("F10 text ratio (_detector.py:805-814)") {
    assert(Classifier.textRatio(0, 1000.0) == 0.0)
    assert(Classifier.textRatio(10, 0.0) == 0.0)
    assert(Classifier.textRatio(10, 960.0) == 1.0)
    assert(Classifier.textRatio(5, 960.0) == 0.5)
  }

  test("P1 needs-OCR predicate (simple.py:121-158)") {
    assert(NeedsOcr(PageType.Scanned, 1000, 0.99, 1.0, 0.5))
    assert(NeedsOcr(PageType.Empty, 0, 0.95, 1.0, 0.5))
    // text thresholds: <50 chars, quality <0.4, confidence < thr
    assert(NeedsOcr(PageType.Text, 49, 0.9, 1.0, 0.5))
    assert(!NeedsOcr(PageType.Text, 50, 0.9, 0.4, 0.5))
    assert(NeedsOcr(PageType.Text, 500, 0.9, 0.39, 0.5))
    assert(NeedsOcr(PageType.Text, 500, 0.49, 1.0, 0.5))
    assert(!NeedsOcr(PageType.Text, 500, 0.5, 1.0, 0.5))
    // mixed thresholds: <100 chars, quality <0.5
    assert(NeedsOcr(PageType.Mixed, 99, 0.9, 1.0, 0.5))
    assert(!NeedsOcr(PageType.Mixed, 100, 0.9, 0.5, 0.5))
    assert(NeedsOcr(PageType.Mixed, 500, 0.9, 0.49, 0.5))
    // threshold monotonicity: higher threshold ⇒ superset
    for (len <- Seq(40, 80, 150, 600); q <- Seq(0.2, 0.45, 0.8); c <- Seq(0.3, 0.6, 0.85);
         t <- PageType.all) {
      val low = NeedsOcr(t, len, c, q, 0.1)
      val mid = NeedsOcr(t, len, c, q, 0.5)
      val high = NeedsOcr(t, len, c, q, 0.9)
      assert(!low || mid, s"monotonic 0.1→0.5 at ($t,$len,$q,$c)")
      assert(!mid || high, s"monotonic 0.5→0.9 at ($t,$len,$q,$c)")
    }
  }

  test("A2 document status (simple.py:106-111)") {
    assert(NeedsOcr.docStatus(0, 10) == "false")
    assert(NeedsOcr.docStatus(10, 10) == "true")
    assert(NeedsOcr.docStatus(3, 10) == "partial")
    assert(NeedsOcr.docStatus(0, 0) == "false") // 0 == 0 hits the first branch
  }
}
