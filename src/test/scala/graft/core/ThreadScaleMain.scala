package graft.core

/** Isolate core scaling from Spark: run processPage over N pages on T
  * threads with a simple work-stealing counter, for T in {1, 8, 32}.
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
    val d1 = run(1)
    val d8 = run(8)
    val d32 = run(32)
    println(f"docs/sec: 1T=$d1%.0f 8T=$d8%.0f 32T=$d32%.0f  speedup8=${d8 / d1}%.2f speedup32=${d32 / d1}%.2f eff(8→32)=${d32 / d8 / 4}%.2f")
  }
}
