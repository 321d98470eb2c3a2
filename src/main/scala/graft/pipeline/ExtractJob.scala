package graft.pipeline

import graft.kernel.{DocExtract, Extractor, ProbeConfig}
import graft.model.{DocResult, LineageRow, Page, PageStat}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Counters harvested from accumulators after a run (A11 / north rule). */
final case class ExtractStats(
    docs: Long,
    pages: Long,
    ocrNeeded: Long,
    emptyExtractions: Long,
    bytesIn: Long,
    bytesOut: Long)

/** Job parameters. `buckets` is the output-table bucketing (pmod of url
  * hash) — the unit of lineage/resume; `saltFactor` splits one hot bucket
  * across up to that many tasks (explicit skew salting per the north rule —
  * AQE skew handling doesn't apply because the hot path has no join).
  * `tasks` = 0 lets the job size the shuffle at 2× default parallelism. */
final case class JobConfig(
    probe: ProbeConfig = ProbeConfig(),
    buckets: Int = 64,
    saltFactor: Int = 4,
    tasks: Int = 0,
    resume: Boolean = false,
    langFilter: Option[String] = None,
    runId: String = "run-0")

/** Typed spine row after the relational prologue: `text` is dropped (the
  * kernel never reads it — shuffling it would move dead bytes) and `bucket`
  * is precomputed so the kernel and the write agree on partitioning. */
final case class KeyedPage(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    lang: String,
    bucket: Int)

/** The extraction pipeline (SURVEY.md §3.1 Spark lifecycle):
  *
  * scan → Column-level pruning/filters (resume anti-join J1, lang filter —
  * kept BEFORE the typed boundary so Catalyst pushes them into the parquet
  * scan) → one explicit repartition on (bucket, salt) → `mapPartitions`
  * kernel (X1–X4, F1–F10, C1–C4, P1 per row; pages never leave their row,
  * so A1/A2 are row-local — zero aggregation shuffle) → bucketed partitioned
  * parquet write + per-bucket lineage rows (A11).
  *
  * Exactly ONE shuffle on the hot path: the explicit repartition. Lineage is
  * computed by re-reading cheap scalar columns of the freshly written output
  * (columnar scan; never re-reads html), so a "done" lineage row implies the
  * bucket's data is durable — that ordering is what makes resume safe.
  */
object ExtractJob {

  /** A11 counter accumulators. */
  final case class Accums(
      docs: LongAccumulator, pages: LongAccumulator, ocr: LongAccumulator,
      empty: LongAccumulator, bytesIn: LongAccumulator, bytesOut: LongAccumulator)

  def newAccums(spark: SparkSession): Accums = Accums(
    spark.sparkContext.longAccumulator("graft.docs"),
    spark.sparkContext.longAccumulator("graft.pages"),
    spark.sparkContext.longAccumulator("graft.ocr_needed"),
    spark.sparkContext.longAccumulator("graft.empty_extractions"),
    spark.sparkContext.longAccumulator("graft.bytes_in"),
    spark.sparkContext.longAccumulator("graft.bytes_out"))

  /** The sink-free pipeline: relational prologue → kernel, NARROW end to
    * end — extraction is per-row, so no byte of raw `html` ever crosses a
    * shuffle. Task sizing comes from the scan split
    * (spark.sql.files.maxPartitionBytes bounds html bytes per task). The
    * explicit bucket+salt repartition happens in `run`, AFTER the kernel,
    * where the payload is the (smaller) extracted output — at 100 TB that
    * ordering is the difference between shuffling 100 TB of html and
    * shuffling ~30 TB of text. Used directly by the flagship entry and the
    * bench (no write). */
  def transform(
      spark: SparkSession,
      input: DataFrame,
      cfg: JobConfig,
      accums: Option[Accums] = None,
      doneBucketList: Seq[Int] = Seq.empty): Dataset[DocResult] = {
    import spark.implicits._

    // -- relational prologue (Column exprs only → pushdown-friendly) --------
    var pages = input
      .select($"url", $"warc_ts", $"html", $"lang")
      .filter($"url".isNotNull)
    cfg.langFilter.foreach(l => pages = pages.filter($"lang" === l))
    val keyed = pages.withColumn(
      "bucket", pmod(xxhash64($"url"), lit(cfg.buckets)).cast("int"))

    // J1 — checkpoint resume: prune done buckets (a literal NOT IN — pushed
    // into the parquet scan, strictly cheaper than an anti-join at ≤buckets
    // values).
    val todo =
      if (doneBucketList.isEmpty) keyed
      else keyed.filter(!$"bucket".isin(doneBucketList: _*))

    // -- the kernel (one Extractor instance per partition, D6 analog) -------
    val probeCfg = cfg.probe
    todo.as[KeyedPage].mapPartitions { it =>
      val extractor = new Extractor(probeCfg)
      it.map { kp =>
        val bytesIn = if (kp.html == null) 0L else kp.html.length.toLong
        val ex = extractor.extract(kp.html)
        val row = toDocResult(kp, ex, bytesIn)
        accums.foreach { a =>
          a.docs.add(1)
          a.pages.add(row.total_pages)
          a.ocr.add(row.ocr_page_count)
          if (row.extracted_text.isEmpty) a.empty.add(1)
          a.bytesIn.add(bytesIn)
          a.bytesOut.add(row.bytes_out)
        }
        row
      }
    }
  }

  def run(spark: SparkSession, input: DataFrame, outDir: String, cfg: JobConfig): ExtractStats = {
    import spark.implicits._
    val acc = newAccums(spark)
    val done = if (cfg.resume) doneBuckets(spark, outDir) else Seq.empty
    val results = transform(spark, input, cfg, Some(acc), done)

    // -- the one explicit shuffle: bucket + salt, post-kernel (D3/D4) -------
    // Aligns writer tasks with output buckets (bounded file counts) and
    // splits a hot bucket across saltFactor writers; the shuffle payload is
    // extracted output, never raw html.
    val nTasks =
      if (cfg.tasks > 0) cfg.tasks
      else math.max(cfg.buckets, spark.sparkContext.defaultParallelism * 2)
    val placed = results.repartition(nTasks, $"bucket",
      pmod(xxhash64($"url", lit(7)), lit(cfg.saltFactor)))

    // -- sink: partitioned (bucketed-by-url-hash) parquet -------------------
    // Resume writes with DYNAMIC partition overwrite, not append: if a
    // previous run died in the docs-committed/lineage-missing window, the
    // re-extraction of those buckets REPLACES their partitions instead of
    // appending duplicates — resume is idempotent across any crash point.
    if (cfg.resume)
      placed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(s"$outDir/docs")
    else
      placed.write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/docs")

    // -- lineage AFTER data commit (resume-safety ordering) -----------------
    // Returned stats are aggregated from the lineage rows this invocation
    // writes (exactly-once: derived from durable committed output), NOT
    // from the accumulators — accumulators increment inside a
    // transformation, so retried/speculative tasks over-count them; they
    // remain attached for live progress telemetry only.
    val mode = if (cfg.resume) "append" else "overwrite"
    writeLineage(spark, outDir, cfg, mode)
  }

  def readDocs(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/docs")

  /** Typed view of the output table (e.g. for the WET sink). */
  def readDocsTyped(spark: SparkSession, outDir: String): Dataset[DocResult] = {
    import spark.implicits._
    readDocs(spark, outDir).as[DocResult]
  }

  def readLineage(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/lineage")

  /** Exploded per-page stats table — the input of the §3.2 summary/reporting
    * layer; reads only scalar columns of the output, never `html`. */
  def pageStats(spark: SparkSession, outDir: String): DataFrame = {
    val docs = readDocs(spark, outDir)
    docs.select(col("url"), col("bucket"), explode(col("page_stats")).as("p"))
      .select(col("url"), col("bucket"), col("p.*"))
  }

  private def doneBuckets(spark: SparkSession, outDir: String): Seq[Int] = {
    try {
      readLineage(spark, outDir)
        .filter(col("status") === "done")
        .select("bucket").distinct()
        .collect().map(_.getInt(0)).toSeq
    } catch {
      case _: Exception => Seq.empty // no lineage yet → nothing done
    }
  }

  private def writeLineage(
      spark: SparkSession, outDir: String, cfg: JobConfig,
      mode: String): ExtractStats = {
    import spark.implicits._
    val prevDone: Set[Int] =
      if (mode == "append") doneBuckets(spark, outDir).toSet else Set.empty
    val allDocs = readDocs(spark, outDir)
    val newDocs =
      if (prevDone.isEmpty) allDocs
      else allDocs.filter(!$"bucket".isin(prevDone.toSeq: _*))
    val lineage = newDocs
      .groupBy($"bucket")
      .agg(
        count(lit(1)).as("docs"),
        sum($"total_pages").cast("long").as("pages"),
        sum($"ocr_page_count").cast("long").as("ocr_needed"),
        sum(when(length($"extracted_text") === 0, 1L).otherwise(0L)).as("empty_extractions"),
        sum($"bytes_in").as("bytes_in"),
        sum($"bytes_out").as("bytes_out"))
      .select($"bucket", lit("done").as("status"), $"docs", $"pages",
        $"ocr_needed", $"empty_extractions", $"bytes_in", $"bytes_out",
        lit(cfg.runId).as("run_id"))
      .as[LineageRow]
      .persist()
    try {
      lineage.write.mode(mode).parquet(s"$outDir/lineage")
      val rows = lineage.collect()
      ExtractStats(
        rows.map(_.docs).sum, rows.map(_.pages).sum,
        rows.map(_.ocr_needed).sum, rows.map(_.empty_extractions).sum,
        rows.map(_.bytes_in).sum, rows.map(_.bytes_out).sum)
    } finally lineage.unpersist()
  }

  /** Public alias for the streaming module (same row mapping). */
  def toDocResultPublic(kp: KeyedPage, ex: DocExtract, bytesIn: Long): DocResult =
    toDocResult(kp, ex, bytesIn)

  private[pipeline] def toDocResult(kp: KeyedPage, ex: DocExtract, bytesIn: Long): DocResult = {
    val stats = ex.pageResults.map { r =>
      PageStat(
        page_number = r.pageNumber + 1,
        page_type = r.pageType,
        confidence = r.confidence,
        text_ratio = r.textRatio,
        image_ratio = r.imageRatio,
        text_length = r.textLength,
        image_count = r.imageCount,
        ocr_quality_score = r.ocrQualityScore,
        text_density = r.textDensity,
        formatting_consistency = r.formattingConsistency,
        has_text_quality = r.hasTextQuality,
        extraction_method = r.extractionMethod,
        analysis_mode = r.analysisMode,
        needs_ocr = ex.pages.contains(r.pageNumber + 1),
        error = r.error.getOrElse(""))
    }.toArray
    DocResult(
      url = kp.url,
      warc_ts = kp.warc_ts,
      lang = kp.lang,
      bucket = kp.bucket,
      doc_kind = ex.docKind,
      status = ex.status,
      pages = ex.pages.toArray,
      total_pages = ex.totalPages,
      ocr_page_count = ex.pages.length,
      extracted_text = ex.extractedText,
      spans = ex.spans.toArray,
      title = ex.title,
      bytes_in = bytesIn,
      bytes_out = utf8Length(ex.extractedText),
      error = ex.error.getOrElse(""),
      page_stats = stats,
      page_images = ex.pageImages)
  }

  /** UTF-8 byte length without materializing the byte array. */
  private def utf8Length(s: String): Long = {
    var bytes = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80) bytes += 1
      else if (c < 0x800) bytes += 2
      else if (Character.isHighSurrogate(c)) { bytes += 4; i += 1 }
      else bytes += 3
      i += 1
    }
    bytes
  }
}
