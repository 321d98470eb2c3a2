package graft.tools

import graft.pipeline.{ExtractJob, JobConfig, SynthSource}
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan printing for PlanSpec development. */
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("pd_").toString
    SynthSource.writeCorpus(spark, 200L, 42L, dir)

    val df = ExtractJob.transform(spark, spark.read.parquet(dir),
      JobConfig(), doneBucketList = Seq(1, 2, 3)).toDF()
    println("=== RESUME PLAN ===")
    println(df.queryExecution.executedPlan.toString)

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mh = graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text")
    println("=== MINHASH PLAN (join/exchange lines) ===")
    mh.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .foreach(l => println(l.take(160)))

    val q1 = graft.SparkEntry.queries("q01_classify_needs_ocr")(
      spark, "/root/testdata/sf0.001")
    println("=== Q01 PLAN ===")
    println(q1.queryExecution.executedPlan.toString.take(700))
    spark.stop()
  }
}
