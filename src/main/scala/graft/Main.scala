package graft

import graft.kernel.ProbeConfig
import graft.pipeline.{ExtractJob, JobConfig, Summary, SynthSource}
import org.apache.spark.sql.SparkSession

/** Production spark-submit entrypoint (the north rule's deployment shape):
  *
  * {{{
  * spark-submit --class graft.Main ocrdetectionspark.jar \
  *   extract --input <page-table-path> --output <dir> \
  *   [--buckets 4096] [--salt 8] [--tasks N] [--resume] [--lang en] \
  *   [--threshold 0.5] [--accuracy] [--images]
  * spark-submit --class graft.Main <jar> synth --n 100000 --output <dir>
  * spark-submit --class graft.Main <jar> summary --output <extract-dir>
  * }}}
  *
  * In cluster deployments the session comes fully configured from
  * spark-submit (master, executors, AQE, shuffle partitions); nothing here
  * assumes local mode.
  */
object Main {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val cmd = args.head
    val opts = parseOpts(args.tail)

    val spark = SparkSession.builder()
      .appName(s"graft-$cmd")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try cmd match {
      case "extract" =>
        val input = required(opts, "input")
        val output = required(opts, "output")
        val cfg = JobConfig(
          probe = ProbeConfig(
            confidenceThreshold = opts.getOrElse("threshold", "0.5").toDouble,
            accuracyMode = opts.contains("accuracy"),
            includeImages = opts.contains("images")),
          buckets = opts.getOrElse("buckets", "64").toInt,
          saltFactor = opts.getOrElse("salt", "4").toInt,
          tasks = opts.getOrElse("tasks", "0").toInt,
          resume = opts.contains("resume"),
          langFilter = opts.get("lang"),
          runId = opts.getOrElse("run-id", s"run-${spark.sparkContext.applicationId}"))
        // input: parquet Page table by default; --warc reads CC-style
        // WARC files through WarcSource instead
        val pages =
          if (opts.contains("warc"))
            graft.pipeline.WarcSource.pages(spark, input).toDF()
          else spark.read.parquet(input)
        val stats = ExtractJob.run(spark, pages, output, cfg)
        println(s"[graft] docs=${stats.docs} pages=${stats.pages} " +
          s"ocr_needed=${stats.ocrNeeded} empty=${stats.emptyExtractions} " +
          s"bytes_in=${stats.bytesIn} bytes_out=${stats.bytesOut}")
        // optional WET output alongside the parquet table
        opts.get("wet").filter(_ != "true").orElse(
          if (opts.contains("wet")) Some(s"$output/wet") else None
        ).foreach { wetDir =>
          graft.pipeline.WarcSink.writeWet(
            ExtractJob.readDocsTyped(spark, output), wetDir)
          println(s"[graft] wrote WET conversion records to $wetDir")
        }

      case "synth" =>
        val n = opts.getOrElse("n", "10000").toLong
        val output = required(opts, "output")
        SynthSource.writeCorpus(spark, n, opts.getOrElse("seed", "42").toLong, output)
        println(s"[graft] wrote $n synthetic pages to $output")

      case "summary" =>
        val output = required(opts, "output")
        Summary.corpusSummary(ExtractJob.pageStats(spark, output))
          .show(truncate = false)

      case other =>
        System.err.println(s"unknown command: $other"); usage(); sys.exit(2)
    } finally spark.stop()
  }

  private def parseOpts(args: Array[String]): Map[String, String] = {
    val m = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val key = a.drop(2)
        if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          m += key -> args(i + 1); i += 2
        } else { m += key -> "true"; i += 1 } // boolean flag
      } else i += 1
    }
    m.toMap
  }

  private def required(opts: Map[String, String], key: String): String =
    opts.getOrElse(key, {
      System.err.println(s"missing required --$key"); usage(); sys.exit(2)
    })

  private def usage(): Unit = System.err.println(
    """usage: graft.Main <command> [options]
      |  extract --input P --output P [--buckets N] [--salt N] [--tasks N]
      |          [--resume] [--lang L] [--threshold T] [--accuracy] [--images]
      |          [--warc] (input is CC-style WARC files, not a parquet table)
      |          [--wet [DIR]] (also write WARC conversion records)
      |  synth   --n N --output P [--seed S]
      |  summary --output P""".stripMargin)
}
