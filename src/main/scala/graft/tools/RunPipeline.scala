package graft.tools

import graft.pipeline.{ExtractJob, JobConfig, SynthSource, Summary}
import org.apache.spark.sql.SparkSession

/** Manual end-to-end driver: synthesize a Page corpus, run the extraction
  * pipeline, print stats + a corpus summary. Usage:
  * `sbt "runMain graft.tools.RunPipeline <nDocs> <outDir> [resume]"`. */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000L
    val out = if (args.length > 1) args(1) else "/tmp/graft_pipeline_out"
    val resume = args.length > 2 && args(2) == "resume"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val input = SynthSource.pages(spark, n, seed = 42L).toDF()
    val stats = ExtractJob.run(spark, input, out,
      JobConfig(buckets = 64, resume = resume))
    val secs = (System.nanoTime() - t0) / 1e9

    println(f"[pipeline] docs=${stats.docs} pages=${stats.pages} " +
      f"ocr_needed=${stats.ocrNeeded} empty=${stats.emptyExtractions} " +
      f"bytes_in=${stats.bytesIn} bytes_out=${stats.bytesOut} " +
      f"wall=${secs}%.2fs throughput=${stats.docs / secs}%.1f docs/s")

    ExtractJob.readDocs(spark, out)
      .groupBy("doc_kind", "status").count().orderBy("doc_kind", "status")
      .show(20, truncate = false)
    Summary.corpusSummary(ExtractJob.pageStats(spark, out))
      .select("total_pages", "text_count", "scanned_count", "mixed_count",
        "empty_count", "average_confidence", "average_text_quality",
        "recommended_action")
      .show(truncate = false)
    spark.stop()
  }
}
