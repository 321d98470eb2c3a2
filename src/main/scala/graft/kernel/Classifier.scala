package graft.kernel

/** Page-type literals — byte-identical to the reference's `PageType` enum
  * values (_detector.py:19-25). Kept as String constants (not a sealed trait)
  * so they flow into String columns without mapping. */
object PageType {
  val Text = "text"
  val Scanned = "scanned"
  val Mixed = "mixed"
  val Empty = "empty"
  val all: Seq[String] = Seq(Text, Scanned, Mixed, Empty)
}

/** Document-level OCR status literals (simple.py:10-15). */
object OcrStatus {
  val True = "true"
  val False = "false"
  val Partial = "partial"
}

/** Rule/threshold page classifiers — faithful re-derivation of the
  * reference's decision trees (SURVEY.md §2.9 C1–C4, §2.8 F10). Pure Scala;
  * every threshold is cited to the reference line it came from.
  */
object Classifier {

  /** F10 — `_calculate_text_ratio` (_detector.py:805-814): ~8x12 px/char. */
  def textRatio(textLength: Int, pageArea: Double): Double = {
    if (textLength == 0 || pageArea <= 0) return 0.0
    math.min(textLength * 96.0 / pageArea, 1.0)
  }

  /** C1 — `_classify_page_enhanced` (_detector.py:816-879).
    *
    * Control flow is replicated exactly, including the fall-through: a page
    * with text_length in (200, 500] and quality ≤ 0.4 exits the text branch
    * without returning and lands on the final MIXED/0.5 fallback
    * (_detector.py:878-879).
    *
    * @return (pageType, confidence)
    */
  def classifyEnhanced(
      textRatio: Double,
      imageRatio: Double,
      textLength: Int,
      contentImageCount: Int,
      metrics: TextMetrics,
      backgroundRatio: Double): (String, Double) = {

    // empty page (_detector.py:828-829)
    if (textLength < 10 && contentImageCount == 0)
      return (PageType.Empty, 0.95)

    if (textLength > 200) { // strong text indicators (_detector.py:832-857)
      val quality = metrics.ocrQualityScore
      val density = metrics.textDensity

      if (quality > 0.6 && density > 0.4) {
        if (backgroundRatio > 0.5)
          return (PageType.Text, math.min(0.9, 0.7 + quality * 0.3))
        else if (contentImageCount <= 2)
          return (PageType.Text, math.min(0.95, 0.8 + quality * 0.2))
        else
          return (PageType.Mixed, math.min(0.85, 0.7 + quality * 0.2))
      } else if (quality > 0.4 || textLength > 500) {
        if (contentImageCount <= 1)
          return (PageType.Text, 0.6 + quality * 0.2)
        else
          return (PageType.Mixed, 0.6 + quality * 0.15)
      }
      // fall through → MIXED 0.5 fallback below
    } else if (textLength >= 50 && textLength <= 200) { // (_detector.py:860-868)
      val quality = metrics.ocrQualityScore
      if (quality > 0.5 && contentImageCount <= 1)
        return (PageType.Text, 0.7)
      else if (contentImageCount > 2 || imageRatio > 0.4)
        return (PageType.Mixed, 0.65)
      else
        return (PageType.Text, 0.6)
    } else { // text_length < 50 (_detector.py:871-876)
      if (contentImageCount > 0 || imageRatio > 0.2)
        return (PageType.Scanned, math.min(0.9, 0.6 + imageRatio * 0.4))
      else
        return (PageType.Empty, 0.8)
    }

    (PageType.Mixed, 0.5) // fallback (_detector.py:878-879)
  }

  /** C2 — `_classify_page` legacy fallback (_detector.py:881-919). Retained
    * for code-path parity even though the Scala C1 is total. */
  def classifyLegacy(
      textRatio: Double,
      imageRatio: Double,
      textLength: Int,
      imageCount: Int): (String, Double) = {

    if (textLength < 10 && imageCount == 0)
      return (PageType.Empty, 0.95)

    if (textLength > 500 && textRatio > 0.1) {
      if (imageRatio < 0.2)
        return (PageType.Text, math.min(0.9, 0.7 + textRatio * 0.5))
      else
        return (PageType.Mixed, math.min(0.85, 0.6 + textRatio * 0.3))
    }

    if (textLength < 50 && imageRatio > 0.3)
      return (PageType.Scanned, math.min(0.9, 0.6 + imageRatio * 0.4))

    if (textLength >= 50 && textLength <= 500) {
      if (imageRatio > 0.4) return (PageType.Mixed, 0.7)
      else if (textRatio > 0.05) return (PageType.Text, 0.75)
      else return (PageType.Scanned, 0.6)
    }

    if (textRatio > imageRatio)
      (PageType.Text, 0.5 + math.min(textRatio, 0.3))
    else
      (PageType.Scanned, 0.5 + math.min(imageRatio, 0.3))
  }

  /** C3 — fast-path classification rules from `analyze_page_fast`
    * (_detector.py:471-487). Inputs are the fast estimates computed there.
    * @return (pageType, confidence) */
  def classifyFast(
      textLength: Int,
      imageCount: Int,
      estimatedTextRatio: Double,
      estimatedImageRatio: Double): (String, Double) = {
    if (textLength < 10 && imageCount == 0) (PageType.Empty, 0.9)
    else if (textLength > 500 && estimatedTextRatio > 0.1) (PageType.Text, 0.8)
    else if (textLength < 50 && imageCount > 0) (PageType.Scanned, 0.8)
    else if (textLength > 50 && imageCount > 0) (PageType.Mixed, 0.7)
    else {
      val t = if (textLength > estimatedImageRatio * 1000) PageType.Text
              else PageType.Scanned
      (t, 0.5)
    }
  }

  /** Fast estimates (_detector.py:450-469): image-coverage and text-ratio
    * heuristics used by C3. @return (estTextRatio, estImageRatio) */
  def fastEstimates(textLength: Int, pageArea: Double, imageCount: Int): (Double, Double) = {
    val estImageRatio = if (imageCount > 0) math.min(0.8, imageCount * 0.2) else 0.0
    val estTextRatio =
      if (textLength > 0 && pageArea > 0) math.min(1.0, textLength * 100.0 / pageArea)
      else 0.0
    (estTextRatio, estImageRatio)
  }
}

/** P1 — `_page_needs_ocr` (simple.py:121-158). */
object NeedsOcr {

  /** @param ocrQuality `details["text_quality"]["ocr_quality_score"]` with the
    *   reference's dict-default of 1.0 when absent (simple.py:139-140) — the
    *   fast path and error rows carry no text_quality block, so callers pass
    *   1.0 there. */
  def apply(
      pageType: String,
      textLength: Int,
      confidence: Double,
      ocrQuality: Double,
      confidenceThreshold: Double): Boolean = pageType match {
    case PageType.Scanned => true
    case PageType.Empty => true
    case PageType.Text =>
      textLength < 50 || ocrQuality < 0.4 || confidence < confidenceThreshold
    case PageType.Mixed =>
      textLength < 100 || ocrQuality < 0.5 || confidence < confidenceThreshold
    case _ => false
  }

  /** A2 — document status from pages-needing-OCR count (simple.py:106-111). */
  def docStatus(needingOcr: Int, totalPages: Int): String =
    if (needingOcr == 0) OcrStatus.False
    else if (needingOcr == totalPages) OcrStatus.True
    else OcrStatus.Partial
}
