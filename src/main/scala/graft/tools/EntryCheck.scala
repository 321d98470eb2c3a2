package graft.tools

import org.apache.spark.sql.SparkSession

/** Replays the driver's smoke check: SparkEntry.entry(spark) rows > 0. */
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = 60)
    println(s"[entry-check] rows=$n schema=${df.schema.fieldNames.mkString(",")}")
    assert(n > 0)
    spark.stop()
  }
}
