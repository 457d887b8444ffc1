package graft.core

/** Isolate core scaling from Spark: run processPage over N pages on T
  * threads with a simple work-stealing counter.
  *
  * No args: the fixed 1/8/32 sweep (host-ceiling probe).
  * `n t1 t2 reps`: the CONTROL experiment for ScalingBench — interleaved
  * (t1, t2) reps with per-level medians and the t1→t2 efficiency, i.e.
  * how well PURE THREADS (no Spark, no shuffle, no encoders) scale between
  * the same two parallelism levels in the same host window. If the Spark
  * job's efficiency matches this number, the loss is the machine's
  * deliverable cycles, not the engine.
  */
object ThreadScaleMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    // pre-generate pages so generation cost is excluded
    val pages = (0 until n).map(i => graft.pipeline.PageGen.page(42L, i.toLong)).toArray

    def run(threads: Int): Double = {
      val idx = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var i = idx.getAndIncrement()
          while (i < n) {
            ExtractCore.processPage(pages(i).html, pages(i).text)
            i = idx.getAndIncrement()
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      n / ((System.nanoTime() - t0) / 1e9)
    }

    run(8) // warmup JIT

    if (args.length >= 3) {
      val t1 = args(1).toInt
      val t2 = args(2).toInt
      val reps = if (args.length > 3) args(3).toInt else 4
      def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
      val pairs = (0 until reps).map(_ => (run(t1), run(t2)))
      val d1 = median(pairs.map(_._1))
      val d2 = median(pairs.map(_._2))
      val eff = (d2 / d1) / (t2.toDouble / t1)
      val raw = pairs.map(p => f"[${p._1}%.0f,${p._2}%.0f]").mkString(",")
      println(f"""{"metric":"thread_scaling","t1":$t1,"t2":$t2,"docs_per_sec_t1":$d1%.1f,"docs_per_sec_t2":$d2%.1f,"efficiency":$eff%.3f,"reps":$reps,"raw":[$raw]}""")
    } else {
      val d1 = run(1)
      val d8 = run(8)
      val d32 = run(32)
      println(f"docs/sec: 1T=$d1%.0f 8T=$d8%.0f 32T=$d32%.0f  speedup8=${d8 / d1}%.2f speedup32=${d32 / d1}%.2f eff(8→32)=${d32 / d8 / 4}%.2f")
    }
  }
}
