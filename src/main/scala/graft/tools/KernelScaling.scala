package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.kernel.{Extractor, ProbeConfig, Synth}

/** Pure-kernel thread-scaling probe (no Spark): runs the Extractor over
  * pre-synthesized payloads with T threads and reports docs/sec. Separates
  * kernel/JVM scaling from Spark machinery when diagnosing ScalingBench. */
object KernelScaling {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 64000
    val payloads: Array[Array[Byte]] =
      Array.tabulate(n)(i => Synth.row(42L, i.toLong).html)

    for (threads <- Seq(8, 32, 8, 32)) {
      val idx = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          val ex = new Extractor(ProbeConfig())
          var i = idx.getAndIncrement()
          while (i < n) {
            val r = ex.extract(payloads(i.toInt))
            if (r.totalPages < 0) println("impossible")
            i = idx.getAndIncrement()
          }
        })
      }
      ts.foreach(_.start())
      ts.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[kernel] threads=$threads: ${n / secs}%.1f docs/sec ($secs%.2f s)")
    }
  }
}
