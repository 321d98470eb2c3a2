package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** F1–F8 golden parity: expected values were produced by executing the
  * reference's pure analyzer (/root/reference/src/ocr_detection/_analyzer.py,
  * CPython 3.13) on these exact fixture strings, then frozen here. Doubles
  * are compared exactly (==): the kernel must reproduce the reference's IEEE
  * arithmetic bit-for-bit on these inputs.
  */
class TextQualitySpec extends AnyFunSuite {

  final case class Golden(
      text: String, charCount: Int, wordCount: Int, lineCount: Int,
      avgWordLength: Double, structured: Boolean,
      english: Double, numeric: Double, special: Double,
      quality: Double, density: Double, formatting: Double,
      artifactCount: Int, artifactConf: Double, artifactRate: Double)

  val goldens: Map[String, Golden] = Map(
    "empty" -> Golden("", 0, 0, 0, 0.0, false, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0, 1.0, 0.0),
    "simple" -> Golden(
      "The court heard the case and the law was applied to the appeal.",
      63, 13, 1, 3.8461538461538463, false, 1.0, 0.0, 0.0,
      0.9538461538461539, 0.8666666666666667, 0.0, 0, 1.0, 0.0),
    "prose" -> Golden(
      "The court heard the case. The plaintiff filed a petition with the court.\nThe defendant should appeal the order. We have some evidence for this case.\nThe law is clear and the ruling was made in the court of appeals.",
      214, 40, 3, 4.25, false, 1.0, 0.0, 0.0,
      0.9400000000000001, 0.888888888888889, 0.3, 1, 0.95, 0.025),
    "structured" -> Golden(
      "1. First item\n2. Second item\n\n\n\nITEMS LIST:\n| name | value |\n- bullet one\n- bullet two",
      86, 14, 9, 4.071428571428571, true, 0.0, 0.023255813953488372,
      0.03488372093023256, 0.5, 0.4666666666666667, 0.6,
      2, 0.7894736842105263, 0.10526315789473684),
    "ocr_garbage" -> Golden(
      "Th|| l||ne has rn1staken chars c1ear1y O0dd |||| and m0re n0ise !!@@##",
      70, 11, 1, 4.090909090909091, false, 1.0, 0.08571428571428572,
      0.17142857142857143, 0.5545454545454546, 0.7333333333333333, 0.0,
      6, 0.1, 0.5),
    "numbers" -> Golden(
      "123 456 7890 totals: 99.5% of 1000 items in 2025",
      48, 11, 1, 3.272727272727273, false, 1.0, 0.4375,
      0.020833333333333332, 0.5545454545454546, 0.7333333333333333, 0.0,
      0, 1.0, 0.0),
    "unicode" -> Golden(
      "Café résumé naïve über straße — the café was open.\nThe menu had café au lait for us.",
      84, 17, 2, 3.764705882352941, false, 1.0, 0.0, 0.011904761904761904,
      0.8058823529411764, 0.5666666666666667, 0.0, 0, 1.0, 0.0),
    "short_lines" -> Golden(
      "a\nb\nc\nd\ne\nf",
      11, 6, 6, 1.0, false, 0.0, 0.0, 0.0, 0.5, 0.2, 0.3, 0, 1.0, 0.0),
    "tabs_and_spaces" -> Golden(
      "  indented line one with the words here\n\tTabbed line two has more of the words\n  indented line three with the case\n\n  after blank the court case ends.",
      150, 27, 5, 4.2592592592592595, false, 1.0, 0.0, 0.0,
      0.6222222222222221, 0.45, 1.0, 0, 1.0, 0.0),
    "no_sentences" -> Golden(
      "just words here no punctuation at all only plain words flowing along",
      68, 12, 1, 4.75, false, 0.0, 0.0, 0.0, 0.55, 0.8, 0.0,
      1, 0.8333333333333334, 0.08333333333333333),
    "caps_heavy" -> Golden(
      "THE COURT CASE WAS HEARD IN THE COURT. THE LAW APPLIES TO ALL. WE ARE HERE.",
      75, 16, 1, 3.5625, false, 1.0, 0.0, 0.0, 0.74375, 1.0, 0.0,
      3, 0.625, 0.1875),
    "mixed_ws" -> Golden(
      " leading and trailing   nbsp  text here. The case was won. \n The other line is this one. ",
      89, 16, 2, 4.0, false, 1.0, 0.0, 0.0, 0.85, 0.5333333333333333, 0.0,
      0, 1.0, 0.0),
    "trailing_newlines" -> Golden(
      "The case ends here.\n\n",
      21, 4, 3, 3.75, false, 1.0, 0.0, 0.0, 0.65, 0.8, 0.7, 0, 1.0, 0.0)
  )

  goldens.foreach { case (name, g) =>
    test(s"analyze_text_quality golden: $name") {
      val m = TextQuality.analyze(g.text)
      assert(m.charCount == g.charCount, "char_count")
      assert(m.wordCount == g.wordCount, "word_count")
      assert(m.lineCount == g.lineCount, "line_count")
      assert(m.avgWordLength == g.avgWordLength, "avg_word_length")
      assert(m.hasStructuredContent == g.structured, "structured")
      assert(m.english == g.english, "english")
      assert(m.numeric == g.numeric, "numeric")
      assert(m.specialChars == g.special, "special_chars")
      assert(m.ocrQualityScore == g.quality, "ocr_quality_score")
      assert(m.textDensity == g.density, "text_density")
      assert(m.formattingConsistency == g.formatting, "formatting_consistency")
    }

    test(s"detect_ocr_artifacts golden: $name") {
      val a = TextQuality.detectOcrArtifacts(g.text)
      assert(a.artifactsFound.map(_.count).sum == g.artifactCount, "artifact count")
      assert(a.confidence == g.artifactConf, "artifact confidence")
      assert(a.errorRate == g.artifactRate, "error rate")
    }
  }

  test("suggest_processing_method rule map (_analyzer.py:149-205)") {
    assert(TextQuality.suggestProcessingMethod("text", 0.9, None).method == "direct_extraction")
    assert(TextQuality.suggestProcessingMethod("text", 0.9, Some(0.2)).method == "verify_with_ocr")
    assert(TextQuality.suggestProcessingMethod("scanned", 0.8, None).method == "ocr_required")
    assert(TextQuality.suggestProcessingMethod("mixed", 0.6, None).method == "hybrid_processing")
    assert(TextQuality.suggestProcessingMethod("scanned", 0.4, None).method == "manual_review")
    assert(TextQuality.suggestProcessingMethod("empty", 0.6, None).method == "unknown")
    // special-chars override applies only to direct_extraction (ref :191-203)
    assert(TextQuality.suggestProcessingMethod("mixed", 0.9, Some(0.2)).method == "hybrid_processing")
  }

  test("python strip/split semantics") {
    assert(Py.strip("  hi  ") == "hi") // NBSP stripped like CPython
    assert(Py.strip("x") == "x")
    assert(Py.splitOn("a\nb\n", '\n').toSeq == Seq("a", "b", "")) // trailing kept
    assert(Py.splitWs("  a\t b c ").toSeq == Seq("a", "b", "c"))
    assert(Py.isUpperStr("AB1") && !Py.isUpperStr("Ab") && !Py.isUpperStr("12"))
  }

  test("sample stdev matches statistics.stdev") {
    // statistics.stdev([2, 4, 4, 4, 5, 5, 7, 9]) == 2.138089935299395
    assert(Py.stdevInt(Array(2, 4, 4, 4, 5, 5, 7, 9)) == 2.138089935299395)
  }
}
