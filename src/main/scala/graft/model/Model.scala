package graft.model

import java.sql.Timestamp

import graft.kernel.Span

/** One input row — exactly BASELINE.json's input_hint schema:
  * (url string, warc_ts timestamp, html binary, text string, lang string).
  * Maps the reference's "Document" abstraction (a PDF file path,
  * _detector.py:46-77) onto one row of a 10^12-row table. */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Per-page analysis stats nested inside a DocResult — the relational
  * projection of the reference's `AnalysisResult` (_detector.py:28-40) with
  * the details dict flattened to typed fields (SURVEY.md §1.1). */
final case class PageStat(
    page_number: Int, // 1-indexed in output, like the doc API (simple.py:97-99)
    page_type: String,
    confidence: Double,
    text_ratio: Double,
    image_ratio: Double,
    text_length: Int,
    image_count: Int,
    ocr_quality_score: Double,
    text_density: Double,
    formatting_consistency: Double,
    has_text_quality: Boolean,
    extraction_method: String,
    analysis_mode: String,
    needs_ocr: Boolean,
    error: String)

/** One output row per document. `pages` is ascending 1-indexed (A1);
  * `status` is A2; `spans` are char-offset spans (html: into decoded source,
  * pdf: into extracted_text). Pages never leave their document row, so the
  * page→doc aggregation is row-local — no shuffle (SURVEY.md §2.4 A1). */
final case class DocResult(
    url: String,
    warc_ts: Timestamp,
    lang: String,
    bucket: Int,
    doc_kind: String,
    status: String,
    pages: Array[Int],
    total_pages: Int,
    ocr_page_count: Int,
    extracted_text: String,
    spans: Array[Span],
    title: String,
    bytes_in: Long,
    bytes_out: Long,
    error: String,
    page_stats: Array[PageStat],
    page_images: Map[Int, String])

/** A11 — one lineage row per bucket, enabling checkpoint resume (J1) and
  * carrying the north rule's counters. Written after the bucket's data
  * commit, so presence of a "done" row implies the data is durable. */
final case class LineageRow(
    bucket: Int,
    status: String, // "done"
    docs: Long,
    pages: Long,
    ocr_needed: Long,
    empty_extractions: Long,
    bytes_in: Long,
    bytes_out: Long,
    run_id: String)
