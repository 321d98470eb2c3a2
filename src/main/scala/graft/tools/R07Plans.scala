package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Writes `plans/r07/<query>_<tag>.txt` — the `.explain("formatted")`
  * output of each named SparkEntry query, under the bench session config —
  * so the round-7 optimization evidence (plan diffs) is a committed
  * artifact. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch \
  *     "runMain graft.tools.R07Plans before q15_fullouter_verify,q76_normalized_dedup"
  */
object R07Plans {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-r07-plans")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Paths.get("plans/r07")
    Files.createDirectories(dir)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(dir.resolve(s"${n}_$tag.txt"), s.getBytes("UTF-8"))
      println(s"[r07plans] wrote ${n}_$tag.txt (${s.length} chars)")
    }
    spark.stop()
  }
}
