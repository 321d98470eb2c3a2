package graft.tools

import graft.pipeline.{ExtractJob, JobConfig, SynthSource}
import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for the north rule (BASELINE.json): the same
  * extraction job on the same input at two parallelism levels — local[N]
  * and local[4N] standing in for N vs 4N executors (no real cluster in this
  * sandbox) — reporting docs/sec at both and efficiency =
  * (throughput_4N / throughput_N) / 4. Results go into BENCH.md.
  *
  * Methodology note: this sandbox is a shared VM whose deliverable CPU
  * drifts ±40% over minutes (measured with an independent multi-process
  * burn — aggregate md5/s on 32 fixed processes moved 9.1M→14.2M over 2
  * minutes). Back-to-back timing of the two levels would attribute that
  * drift to the core count, so measurements are INTERLEAVED: `rounds`
  * alternating (N, 4N) pairs, per-pair efficiency, medians reported.
  *
  * Usage: sbt "runMain graft.tools.ScalingBench [nDocs] [N] [rounds]"
  * (defaults 320000 docs, N=8, rounds=4 → local[8] vs local[32]).
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // At bench scale the corpus is small files; the default 128MB
      // bin-packing would coalesce the scan to ~3 tasks and serialize the
      // pipeline behind it. Production guidance (SURVEY §4.3) is the same
      // knob, sized so one task ≈ bounded html bytes.
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One session: JIT/codegen warmup, one timed pass, stop. */
  private def runOnce(cores: Int, corpusPath: String): (Long, Double) = {
    val spark = session(cores)
    val cfg = JobConfig(buckets = 64, tasks = cores * 4)
    val input = spark.read.parquet(corpusPath)
    ExtractJob.transform(spark,
      SynthSource.pages(spark, 10000L, seed = 99L).toDF(), cfg).count()
    val t0 = System.nanoTime()
    val docs = ExtractJob.transform(spark, input, cfg).count()
    val secs = (System.nanoTime() - t0) / 1e9
    spark.stop()
    (docs, docs / secs)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 320000L
    val baseCores = if (args.length > 1) args(1).toInt else 8
    val rounds = if (args.length > 2) args(2).toInt else 4
    val corpusPath = s"/tmp/graft_scaling_corpus_$n"

    // materialize the corpus once so every round reads identical input;
    // enough files that scan parallelism is never the limiter
    val gen = session(baseCores * 4)
    SynthSource.pages(gen, n, seed = 42L).repartition(256)
      .write.mode("overwrite").parquet(corpusPath)
    gen.stop()

    val pairs = (1 to rounds).map { r =>
      val (docs, tN) = runOnce(baseCores, corpusPath)
      val (_, t4N) = runOnce(baseCores * 4, corpusPath)
      val eff = (t4N / tN) / 4.0
      println(f"[scaling] round $r: local[$baseCores]=$tN%.1f docs/s, " +
        f"local[${baseCores * 4}]=$t4N%.1f docs/s, pair efficiency=$eff%.3f " +
        f"($docs docs)")
      (tN, t4N, eff)
    }

    val tN = median(pairs.map(_._1))
    val t4N = median(pairs.map(_._2))
    val eff = median(pairs.map(_._3))
    println(f"""{"n_docs":$n,"base_cores":$baseCores,"rounds":$rounds,""" +
      f""""docs_per_sec_N":$tN%.1f,"docs_per_sec_4N":$t4N%.1f,""" +
      f""""scaling_efficiency":$eff%.3f}""")
  }
}
