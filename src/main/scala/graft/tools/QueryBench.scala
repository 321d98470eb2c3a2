package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Focused per-query repetition bench: times a comma-separated list of
  * SparkEntry query names `reps` times each, interleaved (round-robin, so
  * a host-capacity drift hits every query equally rather than whichever
  * ran last — the BENCH.md §0 discipline). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch \
  *     "runMain graft.tools.QueryBench q45_dedup_components,q54_curation_verdicts 3"
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q45_dedup_components", "q54_curation_verdicts",
        "q55_ann_ivf_trained")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-query-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    SparkEntry.queries("q35_lineitem_pricing")(spark, sfDir).count() // warmup

    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[qbench] rep=$r $n%-28s $secs%8.3f s rows=$cnt")
    }
    spark.stop()
  }
}
