package graft.kernel

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

/** Broad byte-identity parity: 100 randomized adversarial texts (prose,
  * char soup, structured fragments, OCR-garbage shapes, whitespace edges —
  * incl. NBSP, tabs, unicode, CJK, and 12 non-BMP rows: emoji, math
  * alphanumerics, astral CJK — exercising code-point len/slice/isupper
  * semantics) were run through the REFERENCE analyzer
  * (/root/reference/src/ocr_detection/_analyzer.py, CPython 3.13) and its
  * outputs frozen in golden/analyzer_parity.tsv (base64 text + exact float
  * reprs). Every metric must match bit-for-bit. Complements the 13
  * hand-picked goldens in TextQualitySpec with breadth. */
class AnalyzerParitySpec extends AnyFunSuite {

  private val records: Seq[Array[String]] =
    new String(Files.readAllBytes(
      Paths.get("src/test/resources/golden/analyzer_parity.tsv")),
      StandardCharsets.US_ASCII)
      .split('\n').filter(_.nonEmpty).toSeq.map(_.split('\t'))

  test("parity corpus loaded") {
    assert(records.length == 112)
    assert(records.forall(_.length == 15))
  }

  test("analyze_text_quality: bit-identical on all 112 randomized texts") {
    records.zipWithIndex.foreach { case (f, i) =>
      val text = new String(Base64.getDecoder.decode(f(0)), StandardCharsets.UTF_8)
      val m = TextQuality.analyze(text)
      def d(s: String): Double = java.lang.Double.parseDouble(s)
      withClue(s"record $i (${text.take(60).replace("\n", "\\n")}…): ") {
        assert(m.charCount == f(1).toInt, "char_count")
        assert(m.wordCount == f(2).toInt, "word_count")
        assert(m.lineCount == f(3).toInt, "line_count")
        assert(m.avgWordLength == d(f(4)), "avg_word_length")
        assert(m.hasStructuredContent == (f(5) == "1"), "structured")
        assert(m.english == d(f(6)), "english")
        assert(m.numeric == d(f(7)), "numeric")
        assert(m.specialChars == d(f(8)), "special_chars")
        assert(m.ocrQualityScore == d(f(9)), "ocr_quality_score")
        assert(m.textDensity == d(f(10)), "text_density")
        assert(m.formattingConsistency == d(f(11)), "formatting_consistency")
      }
    }
  }

  test("detect_ocr_artifacts: bit-identical on all 112 randomized texts") {
    records.zipWithIndex.foreach { case (f, i) =>
      val text = new String(Base64.getDecoder.decode(f(0)), StandardCharsets.UTF_8)
      val a = TextQuality.detectOcrArtifacts(text)
      def d(s: String): Double = java.lang.Double.parseDouble(s)
      withClue(s"record $i: ") {
        assert(a.artifactsFound.map(_.count).sum == f(12).toInt, "artifact count")
        assert(a.confidence == d(f(13)), "confidence")
        assert(a.errorRate == d(f(14)), "error_rate")
      }
    }
  }
}
