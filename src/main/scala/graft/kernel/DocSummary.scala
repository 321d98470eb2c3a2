package graft.kernel

/** Per-document summary — the expert API's `get_summary`
  * (_detector.py:687-730) re-derived for one document's page results.
  * The corpus-scale variant lives in pipeline.Summary (same thresholds,
  * Column expressions); this kernel version backs the single-document API.
  */
final case class DocSummary(
    totalPages: Int,
    typeCounts: Map[String, Int],
    typePercentages: Map[String, Double],
    averageConfidence: Double,
    averageTextQuality: Double,
    recommendedAction: String,
    problematic: ProblematicPages)

/** `_identify_problematic_pages` (_detector.py:968-1028). Page numbers are
  * 1-based like the reference's display layer. */
final case class ProblematicPages(
    scannedPages: Vector[Int],
    mixedPagesNeedingOcr: Vector[Int],
    lowQualityTextPages: Vector[Int],
    emptyPages: Vector[Int]) {
  def totalNeedingOcr: Int =
    scannedPages.length + mixedPagesNeedingOcr.length + lowQualityTextPages.length
}

object DocSummary {

  def apply(results: Vector[PageAnalysis]): DocSummary = {
    val totalPages = results.length
    val typeCounts = results.groupBy(_.pageType).map { case (k, v) => k -> v.length }
    val typePercentages =
      typeCounts.map { case (k, c) => k -> c * 100.0 / totalPages }

    val avgConfidence =
      if (totalPages > 0) results.map(_.confidence).sum / totalPages else 0.0

    // conditional average over pages with text_length > 50 AND a
    // text_quality block (_detector.py:705-715)
    val qualifying = results.filter(r => r.textLength > 50 && r.hasTextQuality)
    val avgTextQuality =
      if (qualifying.nonEmpty) qualifying.map(_.ocrQualityScore).sum / qualifying.length
      else 0.0

    DocSummary(totalPages, typeCounts, typePercentages, avgConfidence,
      avgTextQuality,
      recommendationEnhanced(typeCounts, totalPages, avgTextQuality, results),
      problematicPages(results))
  }

  /** `_get_recommendation_enhanced` (_detector.py:921-966). */
  def recommendationEnhanced(
      typeCounts: Map[String, Int],
      totalPages: Int,
      avgTextQuality: Double,
      results: Vector[PageAnalysis]): String = {
    val textPct = typeCounts.getOrElse(PageType.Text, 0) * 100.0 / totalPages
    val mixedPct = typeCounts.getOrElse(PageType.Mixed, 0) * 100.0 / totalPages
    val scannedPct = typeCounts.getOrElse(PageType.Scanned, 0) * 100.0 / totalPages

    // dict-default 0 for quality (_detector.py:945) → fast rows never count
    val goodTextPages = results.count(r =>
      r.textLength > 200 && r.hasTextQuality && r.ocrQualityScore > 0.6)
    val goodTextPct = goodTextPages * 100.0 / totalPages
    val avgTextPerPage = results.map(_.textLength.toLong).sum.toDouble / totalPages

    if ((goodTextPct > 60 && avgTextQuality > 0.6) ||
        (textPct > 70 && avgTextQuality > 0.5) ||
        (goodTextPct > 30 && avgTextPerPage > 300)) "NO OCR NEEDED"
    else if (scannedPct > 70 ||
        (mixedPct > 80 && avgTextQuality < 0.4) ||
        (textPct < 10 && scannedPct + mixedPct > 80)) "OCR REQUIRED"
    else "OCR RECOMMENDED"
  }

  /** `_get_recommendation` legacy (_detector.py:1073-1087). */
  def recommendationLegacy(typeCounts: Map[String, Int], totalPages: Int): String = {
    val ocrNeeded = typeCounts.getOrElse(PageType.Scanned, 0) +
      typeCounts.getOrElse(PageType.Mixed, 0)
    val ocrPct = ocrNeeded * 100.0 / totalPages
    if (ocrPct > 50) "OCR REQUIRED"
    else if (typeCounts.getOrElse(PageType.Text, 0) > 0 && ocrPct < 25) "NO OCR NEEDED"
    else "OCR RECOMMENDED"
  }

  /** `_identify_problematic_pages` (_detector.py:968-1028) — note the
    * asymmetric quality defaults: mixed pages default 0, text pages 1.0. */
  def problematicPages(results: Vector[PageAnalysis]): ProblematicPages = {
    val scanned = Vector.newBuilder[Int]
    val mixed = Vector.newBuilder[Int]
    val lowText = Vector.newBuilder[Int]
    val empty = Vector.newBuilder[Int]
    results.foreach { r =>
      val page = r.pageNumber + 1
      r.pageType match {
        case PageType.Empty => empty += page
        case PageType.Scanned => scanned += page
        case PageType.Mixed =>
          val q = if (r.hasTextQuality) r.ocrQualityScore else 0.0
          if (r.textLength < 100 || q < 0.4 || r.confidence < 0.7) mixed += page
        case PageType.Text =>
          val q = if (r.hasTextQuality) r.ocrQualityScore else 1.0
          if (r.textLength < 50 || q < 0.3 || r.confidence < 0.6) lowText += page
        case _ =>
      }
    }
    ProblematicPages(scanned.result(), mixed.result(), lowText.result(), empty.result())
  }

  /** `_format_page_list` (_detector.py:1063-1071). */
  def formatPageList(pages: Seq[Int]): String =
    if (pages.isEmpty) "None"
    else if (pages.length <= 5) pages.mkString(", ")
    else s"${pages.take(3).mkString(", ")}, ... and ${pages.length - 3} more"

  /** `_create_page_summary` (_detector.py:1030-1061). */
  def pageSummary(p: ProblematicPages): String = {
    if (p.scannedPages.isEmpty && p.mixedPagesNeedingOcr.isEmpty &&
        p.lowQualityTextPages.isEmpty && p.emptyPages.isEmpty)
      return "All pages have good text extraction quality."
    val parts = Vector.newBuilder[String]
    if (p.scannedPages.nonEmpty)
      parts += s"Scanned pages needing OCR: ${formatPageList(p.scannedPages)}"
    if (p.mixedPagesNeedingOcr.nonEmpty)
      parts += ("Mixed content pages that would benefit from OCR: " +
        formatPageList(p.mixedPagesNeedingOcr))
    if (p.lowQualityTextPages.nonEmpty)
      parts += ("Pages with poor text extraction quality: " +
        formatPageList(p.lowQualityTextPages))
    if (p.emptyPages.nonEmpty)
      parts += s"Empty pages (no processing needed): ${formatPageList(p.emptyPages)}"
    parts.result().mkString(" | ")
  }
}
