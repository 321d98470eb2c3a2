package graft

import graft.kernel.{Extractor, ProbeConfig}
import graft.pipeline.{ExtractJob, JobConfig, SynthSource}
import org.apache.spark.sql.SparkSession

/** Extra, NON-driver benchmarks (guide §1.4): noop-sink isolation and a
  * cost split of the flagship extraction pipeline, so OPTIMIZATION_r07.md
  * can attribute pipeline time to (cache scan | kernel compute | DocResult
  * row encoding) instead of guessing. The driver contract lives in
  * [[Bench]] and is untouched; this main exists only for measurement
  * evidence and may evolve freely. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val extractDocs: Long =
      if (sfDir.contains("sf0.1")) 40000L
      else if (sfDir.contains("sf0.01")) 8000L else 2000L
    SynthSource.pages(spark, 500L, seed = 1L).toDF().count()
    val input = SynthSource.pages(spark, extractDocs, seed = 42L).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    input.count()

    def time(name: String)(body: => Long): Unit = {
      // warm once, then best-of-3 (CLAUDE.md: this host's CPU drifts)
      body
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[bx] $name%-34s $secs%8.3f s  (${extractDocs / secs}%.0f docs/s)")
    }

    spark.sparkContext.setJobDescription("bx: cache scan only")
    time("cache_scan_count")(input.count())

    spark.sparkContext.setJobDescription("bx: scan + KeyedPage decode + kernel, tiny row out")
    val probeCfg = ProbeConfig()
    time("kernel_only_long_out") {
      input.select($"url", $"warc_ts", $"html", $"lang")
        .filter($"url".isNotNull)
        .withColumn("bucket", org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64($"url"),
          org.apache.spark.sql.functions.lit(64)).cast("int"))
        .as[graft.pipeline.KeyedPage]
        .mapPartitions { it =>
          val ex = new Extractor(probeCfg)
          it.map { kp => ex.extract(kp.html).totalPages.toLong }
        }.reduce(_ + _)
    }

    spark.sparkContext.setJobDescription("bx: full transform (DocResult encode) + count")
    time("transform_count")(
      ExtractJob.transform(spark, input, JobConfig(buckets = 64)).count())

    spark.sparkContext.setJobDescription(null)
    input.unpersist()
    spark.stop()
  }
}
