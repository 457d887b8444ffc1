package graft

/** Scaling-efficiency evidence (north rule: ≥0.8 throughput scaling from N
  * to 4N executors, evidenced in this sandbox as local[8] vs local[32] on
  * identical input — SURVEY.md §5.2.6).
  *
  * Runs the same extraction job at both parallelism levels in one JVM
  * (sessions created and stopped sequentially), prints one JSON line with
  * docs/sec at each level and the efficiency ratio (T_8/T_32)/4.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 8000L

    def run(cpus: Int, warm: Boolean): Double = {
      val spark = Bench.mkSession(cpus.toString)
      spark.sparkContext.setLogLevel("WARN")
      // warmup until the core is JIT-compiled (an undersized warmup leaves
      // the regex-heavy core interpreted through the measurement and the
      // numbers bimodal)
      if (warm) Bench.extractionThroughput(spark, 6000, cpus * 2)
      val d = Bench.extractionThroughput(spark, n, cpus * 2)
      spark.stop()
      d
    }

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    // the host's vCPUs are shared: single measurements swing ±40%, so
    // interleave the two levels (A B A B A B) and take per-level medians —
    // host noise then hits both levels equally in expectation
    val nCores = if (args.length > 1) args(1).toInt else 4
    val reps = if (args.length > 2) args(2).toInt else 3
    val pairs = (0 until reps).map { r =>
      (run(nCores, warm = r == 0), run(nCores * 4, warm = r == 0))
    }
    val dN = median(pairs.map(_._1))
    val d4N = median(pairs.map(_._2))
    val efficiency = (d4N / dN) / 4.0
    // best-of-reps: the job's scaling when the host actually grants the
    // vCPUs (median is hostage to host stealing — see raw array)
    val bN = pairs.map(_._1).max
    val b4N = pairs.map(_._2).max
    val effBest = (b4N / bN) / 4.0
    val all = pairs.map { case (a, b) => f"[$a%.0f,$b%.0f]" }.mkString(",")
    println(f"""{"metric":"scaling_efficiency","value":$efficiency%.3f,"best_efficiency":$effBest%.3f,"cores_n":$nCores,"cores_4n":${nCores * 4},"docs_per_sec_n":$dN%.1f,"docs_per_sec_4n":$d4N%.1f,"best_docs_per_sec_n":$bN%.1f,"best_docs_per_sec_4n":$b4N%.1f,"n_docs":$n,"reps":$reps,"raw":[$all],"target":0.8}""")
  }
}
