package graft.kernel

/** Metrics about extracted text — mirrors the reference's `TextMetrics`
  * dataclass (_analyzer.py:12-24). `language_indicators` there is a dict with
  * exactly three fixed keys (english / numeric / special_chars,
  * _analyzer.py:95-106), so it is flattened into three doubles here: golden
  * byte-identity needs deterministic field order, which a map cannot give.
  */
final case class TextMetrics(
    charCount: Int,
    wordCount: Int,
    lineCount: Int,
    avgWordLength: Double,
    hasStructuredContent: Boolean,
    english: Double,
    numeric: Double,
    specialChars: Double,
    ocrQualityScore: Double,
    textDensity: Double,
    formattingConsistency: Double)

object TextMetrics {
  /** `TextMetrics(0, 0, 0, 0.0, False, {}, 0.0, 0.0, 0.0)` — empty text
    * (_analyzer.py:33-34); the empty dict means all three indicators read 0.
    */
  val empty: TextMetrics =
    TextMetrics(0, 0, 0, 0.0, hasStructuredContent = false, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
}

/** One OCR-artifact class found in a text (_analyzer.py:129-139). */
final case class OcrArtifact(artifactType: String, count: Int, examples: List[String])

/** `detect_ocr_artifacts` result (_analyzer.py:111-146). */
final case class OcrArtifacts(
    artifactsFound: List[OcrArtifact],
    confidence: Double,
    errorRate: Double)

/** `suggest_processing_method` result (_analyzer.py:149-205). */
final case class ProcessingSuggestion(method: String, reason: String, confidence: String)

/** Pure text-quality scalar functions — a faithful re-derivation of the
  * reference's `ContentAnalyzer` (_analyzer.py:27-364), SURVEY.md §2.8
  * F1–F9. Pure Scala, zero Spark imports; runs inside the `mapPartitions`
  * kernel and in Spark-free unit tests.
  */
object TextQuality {

  private val wordPat = Py.re("\\b\\w+\\b")
  // _detect_structured_content patterns (_analyzer.py:73-80), re.MULTILINE
  private val structuredPats: List[java.util.regex.Pattern] = List(
    Py.reMultiline("\\d+\\.\\s+"),
    Py.reMultiline("[•\\-\\*]\\s+"),
    Py.reMultiline("\\|\\s*\\w+\\s*\\|"),
    Py.reMultiline("\\n\\s*\\n\\s*\\n"),
    Py.reMultiline(":\\s*$"),
    Py.reMultiline("^\\s*[A-Z][A-Z\\s]+:")
  )
  private val englishCommonPat =
    Py.reIgnoreCase("\\b(the|and|or|is|are|was|were|to|of|in|for|with)\\b")
  private val digitPat = Py.re("[0-9]")
  // indicator charset (_analyzer.py:105) differs from the quality-score
  // charset (_analyzer.py:288) — both kept verbatim.
  private val indicatorSpecialPat = Py.re("[^\\w\\s\\.\\,\\!\\?\\:\\;\\-\\(\\)]")
  private val qualitySpecialPat = Py.re("[^\\w\\s\\.\\,\\!\\?\\:\\;\\-\\(\\)\\[\\]\\\"\\'\\/]")
  private val sentenceSplitPat = Py.re("[.!?]+")
  private val properEndingPat = Py.reMultiline("[.!?]\\s*$")

  /** 50-entry stoplist incl. legal terms (_analyzer.py:216-266). */
  private val commonEnglishWords: Set[String] = Set(
    "the", "and", "or", "is", "are", "was", "were", "to", "of", "in", "for",
    "with", "that", "this", "have", "has", "had", "will", "would", "could",
    "should", "not", "but", "from", "they", "we", "he", "she", "it", "you",
    "me", "us", "all", "any", "some", "each", "every", "other", "than",
    "only", "such", "court", "case", "law", "order", "appeal", "petition",
    "plaintiff", "defendant")

  /** The F5 dictionary stoplist, exposed for the DuckDB oracle SQL
    * generation (SparkEntry q32) — the oracle recomputes the dictionary
    * ratio from the same word set. */
  def dictionaryWords: Set[String] = commonEnglishWords

  /** The F4 english-marker words (the alternation in `englishCommonPat`,
    * _analyzer.py:99), exposed for oracle SQL generation. */
  val englishMarkerWords: Seq[String] = Seq(
    "the", "and", "or", "is", "are", "was", "were", "to", "of", "in", "for",
    "with")

  /** F1 — `analyze_text_quality` (_analyzer.py:31-67). */
  def analyze(text: String): TextMetrics = analyzeImpl(text, full = true)

  /** Pipeline-mode metrics: identical values for every field the pipeline
    * consumes (ocr_quality_score, text_density, formatting_consistency,
    * char/word counts), but skips the structured-content and
    * language-indicator regex passes that no classifier or output column
    * reads (C1 uses only quality + density; PageStat stores only the three
    * scores). The full variant stays the API/SQL surface. */
  def analyzeForPipeline(text: String): TextMetrics = analyzeImpl(text, full = false)

  private def analyzeImpl(text: String, full: Boolean): TextMetrics = {
    if (text == null || text.isEmpty) return TextMetrics.empty

    val charCount = Py.len(text) // CPython len(): code points, not UTF-16
    val lines = Py.splitOn(text, '\n')
    val lineCount = lines.length

    val words = Py.findAll(wordPat, text).toArray
    val wordCount = words.length
    val avgWordLength =
      if (words.nonEmpty) Py.meanInt(words.map(Py.len)) else 0.0

    val structured = full && detectStructuredContent(text)
    val (english, numeric, specialChars) =
      if (full) analyzeLanguageIndicators(text) else (0.0, 0.0, 0.0)
    val quality = calculateOcrQualityScore(text, words, lines)
    // text density re-derives the same word count the reference recomputes
    // via a second findall (_analyzer.py:317) — wordCount is that value
    val density = textDensityFromCounts(wordCount, lines, text)
    val formatting = analyzeFormattingConsistency(text, lines)

    TextMetrics(charCount, wordCount, lineCount, avgWordLength, structured,
      english, numeric, specialChars, quality, density, formatting)
  }

  private def textDensityFromCounts(totalWords: Int, lines: Array[String], text: String): Double = {
    if (text.isEmpty || lines.isEmpty) return 0.0
    val nonEmptyLines = lines.count(l => Py.strip(l).nonEmpty)
    if (nonEmptyLines == 0) return 0.0
    val avgWordsPerLine = totalWords.toDouble / nonEmptyLines
    if (avgWordsPerLine >= 5) math.min(avgWordsPerLine / 15, 1.0)
    else avgWordsPerLine / 5
  }

  /** F3 — ≥2 of 6 structure regexes match (_analyzer.py:70-83). */
  def detectStructuredContent(text: String): Boolean =
    structuredPats.count(p => Py.search(p, text)) >= 2

  /** F4 — language indicators (_analyzer.py:86-108); returns
    * (english, numeric, special_chars). */
  def analyzeLanguageIndicators(text: String): (Double, Double, Double) = {
    if (text.isEmpty) return (0.0, 0.0, 0.0)
    val totalChars = Py.len(text)
    val englishCommon = Py.countMatches(englishCommonPat, text)
    val english = math.min(englishCommon / (totalChars / 100.0), 1.0)
    val numeric = Py.countMatches(digitPat, text).toDouble / totalChars
    val special = Py.countMatches(indicatorSpecialPat, text).toDouble / totalChars
    (english, numeric, special)
  }

  /** F5 — `_calculate_ocr_quality_score` (_analyzer.py:208-305): additive
    * score capped at 1.0, accumulated in the reference's term order. */
  def calculateOcrQualityScore(text: String, words: Array[String], lines: Array[String]): Double = {
    if (text.isEmpty || words.isEmpty) return 0.0

    var score = 0.0

    // 1. dictionary-word ratio, max 0.3 (_analyzer.py:268-270)
    val dictionaryMatches = words.count(w =>
      commonEnglishWords.contains(w.toLowerCase(java.util.Locale.ROOT)))
    val dictionaryRatio = dictionaryMatches.toDouble / words.length
    score += math.min(dictionaryRatio * 0.3, 0.3)

    // 2. capitalization consistency in [0.05, 0.4] → +0.2 (_analyzer.py:272-277)
    // word[0].isupper() / len(word) are code-point operations in CPython
    val capitalizedWords = words.count(w =>
      Py.len(w) > 1 && Character.isUpperCase(w.codePointAt(0)))
    val allCapsWords = words.count(w => Py.len(w) > 1 && Py.isUpperStr(w))
    val capConsistency = (capitalizedWords + allCapsWords).toDouble / words.length
    if (capConsistency >= 0.05 && capConsistency <= 0.4) score += 0.2

    // 3. avg sentence length in [5, 30] words → +0.2 (_analyzer.py:279-285)
    val sentences =
      Py.reSplit(sentenceSplitPat, text).map(Py.strip).filter(_.nonEmpty)
    if (sentences.nonEmpty) {
      val avgSentenceLength =
        sentences.map(s => Py.splitWs(s).length).sum.toDouble / sentences.length
      if (avgSentenceLength >= 5 && avgSentenceLength <= 30) score += 0.2
    }

    // 4. special-char ratio < 0.05 → +0.2 (_analyzer.py:287-292)
    val specialCharRatio = Py.countMatches(qualitySpecialPat, text).toDouble / Py.len(text)
    if (specialCharRatio < 0.05) score += 0.2

    // 5. line-length CV < 1.0 → +0.1; SAMPLE stdev (_analyzer.py:294-303)
    val nonEmptyLines = lines.filter(l => Py.strip(l).nonEmpty)
    if (nonEmptyLines.nonEmpty) {
      val lineLengths = nonEmptyLines.map(Py.len)
      val std = if (lineLengths.length > 1) Py.stdevInt(lineLengths) else 0.0
      val avg = Py.meanInt(lineLengths)
      val cv = if (avg > 0) std / avg else 0.0
      if (cv < 1.0) score += 0.1
    }

    math.min(score, 1.0)
  }

  /** F6 — `_calculate_text_density` (_analyzer.py:308-324). Delegates to
    * the shared counts-based body so the pipeline metric and this public
    * API cannot diverge. */
  def calculateTextDensity(text: String, lines: Array[String]): Double =
    textDensityFromCounts(Py.countMatches(wordPat, text), lines, text)

  /** F7 — `_analyze_formatting_consistency` (_analyzer.py:327-364). */
  def analyzeFormattingConsistency(text: String, lines: Array[String]): Double = {
    if (lines.length < 3) return 0.0

    var score = 0.0

    // 1. ≤5 distinct indentation levels → +0.3 (_analyzer.py:334-344)
    val indents = lines.filter(l => Py.strip(l).nonEmpty)
      .map(l => Py.len(l) - Py.len(Py.lstrip(l)))
    if (indents.nonEmpty && indents.toSet.size <= 5) score += 0.3

    // 2. blank-line ratio in [0.1, 0.4] → +0.3 (_analyzer.py:346-353)
    val emptyLineCount = lines.count(l => Py.strip(l).isEmpty)
    val nonEmptyCount = lines.length - emptyLineCount
    if (nonEmptyCount > 0) {
      val emptyRatio = emptyLineCount.toDouble / lines.length
      if (emptyRatio >= 0.1 && emptyRatio <= 0.4) score += 0.3
    }

    // 3. proper-ending ratio > 0.7 → +0.4 (_analyzer.py:355-362)
    val endingsProperly = Py.countMatches(properEndingPat, text)
    val totalSentences = Py.reSplit(sentenceSplitPat, text).length - 1
    if (totalSentences > 0) {
      val properRatio = endingsProperly.toDouble / totalSentences
      if (properRatio > 0.7) score += 0.4
    }

    math.min(score, 1.0)
  }

  // F8 — OCR-artifact patterns (_analyzer.py:119-126)
  private val artifactPats: List[(java.util.regex.Pattern, String)] = List(
    Py.re("[Il1|]{2,}") -> "vertical_line_confusion",
    Py.re("rn(?=\\w)") -> "rn_m_confusion",
    Py.re("cl(?=\\w)") -> "cl_d_confusion",
    Py.re("(?<!\\w)[O0](?=\\w)") -> "o_zero_confusion",
    Py.re("\\b\\w*[^\\w\\s]{2,}\\w*\\b") -> "excessive_special_chars",
    Py.re("\\b[A-Z]{1}[a-z]*[A-Z]{1}[a-z]*\\b") -> "inconsistent_case"
  )

  /** F8 — `detect_ocr_artifacts` (_analyzer.py:111-146). */
  def detectOcrArtifacts(text: String): OcrArtifacts = {
    if (text == null || text.isEmpty) return OcrArtifacts(Nil, 1.0, 0.0)

    var totalMatches = 0
    val artifacts = artifactPats.flatMap { case (pat, kind) =>
      val all = Py.findAll(pat, text)
      if (all.nonEmpty) {
        totalMatches += all.length
        Some(OcrArtifact(kind, all.length, all.take(3)))
      } else None
    }

    val textLength = Py.splitWs(text).length
    val errorRate = if (textLength > 0) totalMatches.toDouble / textLength else 0.0
    val confidence = math.max(0.1, 1.0 - errorRate * 2)
    OcrArtifacts(artifacts, confidence, errorRate)
  }

  /** F9 — `suggest_processing_method` (_analyzer.py:149-205). */
  def suggestProcessingMethod(
      pageType: String,
      confidence: Double,
      specialChars: Option[Double]): ProcessingSuggestion = {
    var s = ProcessingSuggestion("unknown", "", "low")
    if (pageType == PageType.Text && confidence > 0.8)
      s = ProcessingSuggestion("direct_extraction", "High-quality text content detected", "high")
    else if (pageType == PageType.Scanned && confidence > 0.7)
      s = ProcessingSuggestion("ocr_required", "Scanned content detected, OCR processing needed", "high")
    else if (pageType == PageType.Mixed)
      s = ProcessingSuggestion("hybrid_processing",
        "Mixed content - combine text extraction with OCR for images", "medium")
    else if (confidence < 0.5)
      s = ProcessingSuggestion("manual_review",
        "Uncertain classification - manual review recommended", "low")

    if (specialChars.exists(_ > 0.1) && s.method == "direct_extraction")
      s = ProcessingSuggestion("verify_with_ocr",
        "High special character rate suggests possible extraction issues", "medium")
    s
  }
}
