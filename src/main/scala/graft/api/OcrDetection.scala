package graft.api

import graft.kernel.{DocExtract, DocSummary, Extractor, PageAnalysis, PdfParse, PdfPayload, PdfProbe, ProbeConfig}
import graft.model.Page
import graft.pipeline.{ExtractJob, JobConfig}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Public per-document API — the reference's entire surface
  * (`__init__.py:3-10`: `OCRDetection`, `OCRStatus`, `detect_ocr`)
  * re-expressed over payload bytes instead of file paths, plus the
  * table-scale entry points. A user of the reference maps:
  *
  * {{{
  * detect_ocr(path)                      → OcrDetection().detect(bytes)
  * OCRDetection(confidence_threshold=t)  → OcrDetection(OcrDetection.Config(confidenceThreshold = t))
  * result["status"] / ["pages"]          → result.status / result.pages
  * with PDFAnalyzer(p) as a: a.analyze_all_pages() → analyzer.analyzeAllPages(bytes)
  * a.get_summary(rs)                     → analyzer.summary(rs)
  * }}}
  *
  * The same kernel runs per row in the distributed pipeline
  * (`extractTable`), which is where the engine actually lives — this facade
  * exists for single-document ergonomics and for parity with the
  * reference's API shape (simple.py:18-185).
  */
final class OcrDetection(cfg: OcrDetection.Config = OcrDetection.Config()) {

  private val probeCfg = ProbeConfig(
    confidenceThreshold = cfg.confidenceThreshold,
    accuracyMode = cfg.accuracyMode,
    includeImages = cfg.includeImages,
    imageFormat = cfg.imageFormat,
    imageDpi = cfg.imageDpi)

  private val extractor = new Extractor(probeCfg)

  /** `OCRDetection.detect` (simple.py:42-119): status + 1-indexed pages
    * needing OCR (+ page images when configured). */
  def detect(payload: Array[Byte]): OcrDetection.Result = {
    val ex = extractor.extract(payload)
    OcrDetection.Result(ex.status, ex.pages.toList, ex.pageImages, ex)
  }

  /** Expert API — `PDFAnalyzer.analyze_all_pages` (_detector.py:548-558). */
  def analyzeAllPages(payload: Array[Byte]): Vector[PageAnalysis] =
    extractor.extract(payload).pageResults

  /** Expert API — `PDFAnalyzer.get_summary` (_detector.py:687-730). */
  def summary(results: Vector[PageAnalysis]): DocSummary = DocSummary(results)

  /** Expert API, ADDITIVE (beyond the reference, which reads image dict
    * geometry only): per page, luminance statistics of every embedded
    * image whose DCT payload baseline-JPEG-decodes — catches scan-pipeline
    * failures (all-black / all-white payloads) the dict dims can't show.
    * Empty inner vectors for pages without decodable embedded images;
    * empty outer for non-PDF payloads. */
  def imagePixelContent(payload: Array[Byte]): Vector[Vector[graft.kernel.ImagePixelContent]] = {
    val pages =
      if (PdfParse.isRealPdf(payload)) PdfParse.parse(payload).pages
      else if (PdfPayload.isPdf(payload)) PdfPayload.deserialize(payload).pages
      else Vector.empty
    val probe = new PdfProbe(probeCfg)
    pages.map(probe.imagePixelContent)
  }

  /** Table-scale entry: run the same kernel over a Page table and write
    * bucketed output + lineage (the north-rule pipeline). */
  def extractTable(spark: SparkSession, input: DataFrame, outDir: String,
      job: JobConfig = JobConfig()): graft.pipeline.ExtractStats =
    ExtractJob.run(spark, input, outDir, job.copy(probe = probeCfg))

  /** Table-scale transform without a sink. */
  def extractDataset(spark: SparkSession, input: Dataset[Page]): Dataset[graft.model.DocResult] =
    ExtractJob.transform(spark, input.toDF(), JobConfig(probe = probeCfg))

  /** `detect` over any (id, binary payload) columns — no Page schema
    * required. One kernel instance per partition, one result row per input
    * row (status + 1-indexed pages + page count, like simple.py's dict). */
  def detectColumn(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cfgLocal = probeCfg
    df.select(org.apache.spark.sql.functions.col(idCol).cast("string").as("id"),
        org.apache.spark.sql.functions.col(payloadCol).as("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val ex = new Extractor(cfgLocal)
        it.map { case (id, payload) =>
          val r = ex.extract(payload)
          (id, r.status, r.pages.toArray, r.totalPages, r.docKind)
        }
      }
      .toDF(idCol, "status", "pages", "total_pages", "doc_kind")
  }
}

object OcrDetection {

  /** The reference's constructor parameters (simple.py:21-40). */
  final case class Config(
      confidenceThreshold: Double = 0.5,
      includeImages: Boolean = false,
      imageFormat: String = "png",
      imageDpi: Int = 72,
      accuracyMode: Boolean = false)

  /** `detect` result (simple.py:105-118). */
  final case class Result(
      status: String, // "true" | "false" | "partial"
      pages: List[Int], // 1-indexed ascending
      pageImages: Map[Int, String],
      raw: DocExtract)

  /** `detect_ocr` convenience one-liner (simple.py:162-185). */
  def detectOcr(payload: Array[Byte],
      confidenceThreshold: Double = 0.5,
      includeImages: Boolean = false,
      accuracyMode: Boolean = false): Result =
    new OcrDetection(Config(confidenceThreshold = confidenceThreshold,
      includeImages = includeImages, accuracyMode = accuracyMode))
      .detect(payload)

  /** Helper mirroring "open this PDF": build a payload from the structured
    * PDF-like model (FIXTURES.md §3 — no JVM PDF parser offline). */
  def payloadOf(doc: graft.kernel.PdfDoc): Array[Byte] = PdfPayload.serialize(doc)
}
