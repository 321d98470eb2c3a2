package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A3–A10 reporting-layer semantics against hand-computed expectations
  * mirroring the reference (get_summary _detector.py:687-730,
  * recommendations :921-966/:1073-1087, problematic pages :968-1028,
  * page-list formatting :1030-1071). */
class SummarySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-summary-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def stats(rows: (String, Int, String, Double, Int, Double, Boolean)*) =
    rows.toSeq.toDF("url", "page_number", "page_type", "confidence",
      "text_length", "ocr_quality_score", "has_text_quality")

  test("P5 formatPageList: ≤5 joined, >5 first-3 + '... and N more', empty → None") {
    val df = Seq(
      (1, Seq.empty[Long]),
      (2, Seq(7L)),
      (3, Seq(1L, 2L, 3L, 4L, 5L)),
      (4, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))).toDF("id", "pages")
    val got = df.select(col("id"), Summary.formatPageList(col("pages")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(1) == "None")
    assert(got(2) == "7")
    assert(got(3) == "1, 2, 3, 4, 5")
    assert(got(4) == "1, 2, 3, ... and 5 more")
  }

  test("A4/A5: average confidence and conditional text quality") {
    val df = stats(
      ("u", 1, "text", 0.9, 300, 0.8, true),
      ("u", 2, "text", 0.7, 40, 0.2, true), // len ≤ 50 → excluded from A5
      ("u", 3, "scanned", 0.8, 600, 0.0, false)) // no quality block → excluded
    val row = Summary.corpusSummary(df).collect()(0)
    // avg() sum order is engine-internal → tolerance compare (the oracle
    // queries avoid this with scaled-integer sums; the reference itself sums
    // floats in page order, so exactness here is not a parity requirement)
    assert(math.abs(row.getAs[Double]("average_confidence") - (0.9 + 0.7 + 0.8) / 3) < 1e-12)
    assert(row.getAs[Double]("average_text_quality") == 0.8) // only page 1 qualifies
  }

  test("A5 default: no qualifying pages → 0.0 like the reference") {
    val df = stats(("u", 1, "scanned", 0.8, 10, 0.0, false))
    assert(Summary.corpusSummary(df).collect()(0)
      .getAs[Double]("average_text_quality") == 0.0)
  }

  test("A7 enhanced recommendation branches") {
    // >60% good text pages with avg quality > 0.6 → NO OCR NEEDED
    val good = stats(
      ("u", 1, "text", 0.9, 300, 0.8, true),
      ("u", 2, "text", 0.9, 400, 0.7, true),
      ("u", 3, "scanned", 0.8, 10, 0.0, false))
    assert(Summary.corpusSummary(good).collect()(0)
      .getAs[String]("recommended_action") == "NO OCR NEEDED")

    // >70% scanned → OCR REQUIRED
    val scanned = stats(
      ("u", 1, "scanned", 0.8, 5, 0.0, false),
      ("u", 2, "scanned", 0.8, 5, 0.0, false),
      ("u", 3, "scanned", 0.8, 5, 0.0, false),
      ("u", 4, "text", 0.9, 300, 0.8, true))
    assert(Summary.corpusSummary(scanned).collect()(0)
      .getAs[String]("recommended_action") == "OCR REQUIRED")

    // neither → OCR RECOMMENDED
    val middle = stats(
      ("u", 1, "scanned", 0.8, 5, 0.0, false),
      ("u", 2, "text", 0.9, 100, 0.5, true),
      ("u", 3, "mixed", 0.7, 150, 0.5, true))
    assert(Summary.corpusSummary(middle).collect()(0)
      .getAs[String]("recommended_action") == "OCR RECOMMENDED")
  }

  test("A8 legacy recommendation") {
    val df = stats(
      ("u", 1, "text", 0.9, 300, 0.8, true),
      ("u", 2, "text", 0.9, 300, 0.8, true),
      ("u", 3, "text", 0.9, 300, 0.8, true),
      ("u", 4, "text", 0.9, 300, 0.8, true),
      ("u", 5, "scanned", 0.8, 5, 0.0, false))
    // (scanned+mixed)/total = 20% < 25 with text present → NO OCR NEEDED
    assert(Summary.corpusSummary(df).collect()(0)
      .getAs[String]("recommended_action_legacy") == "NO OCR NEEDED")
  }

  test("A9 problematic categories with the reference's asymmetric defaults") {
    val df = stats(
      ("u", 1, "empty", 0.95, 0, 0.0, false), // empty_pages
      ("u", 2, "scanned", 0.8, 5, 0.0, false), // scanned_pages
      ("u", 3, "mixed", 0.9, 50, 0.0, false), // mixed: default q=0 <0.4 → flagged
      ("u", 4, "text", 0.9, 400, 0.0, false), // text: default q=1.0 → NOT flagged
      ("u", 5, "mixed", 0.9, 500, 0.9, true), // healthy mixed
      ("u", 6, "text", 0.9, 400, 0.2, true)) // text, low quality → flagged
    val cats = df.withColumn("c", Summary.problematicCategory)
      .select("page_number", "c").collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(cats(1).contains("empty_pages"))
    assert(cats(2).contains("scanned_pages"))
    assert(cats(3).contains("mixed_pages_needing_ocr"))
    assert(cats(4).isEmpty)
    assert(cats(5).isEmpty)
    assert(cats(6).contains("low_quality_text_pages"))
  }

  test("A10 summary string: fixed order, pipe separators, clean default") {
    val df = stats(
      ("u", 2, "scanned", 0.8, 5, 0.0, false),
      ("u", 5, "scanned", 0.8, 5, 0.0, false),
      ("u", 9, "empty", 0.95, 0, 0.0, false),
      ("u", 1, "text", 0.9, 400, 0.9, true))
    val s = Summary.problematicPages(df).collect()(0).getAs[String]("summary")
    assert(s == "Scanned pages needing OCR: 2, 5 | " +
      "Empty pages (no processing needed): 9", s)
    assert(Summary.problematicPages(df).collect()(0)
      .getAs[Int]("total_pages_needing_ocr") == 2)

    val clean = stats(("u", 1, "text", 0.9, 400, 0.9, true))
    assert(Summary.problematicPages(clean).collect()(0).getAs[String]("summary") ==
      "All pages have good text extraction quality.")
  }
}
