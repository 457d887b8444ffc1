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

    def run(cpus: Int): Double = {
      val spark = Bench.mkSession(cpus.toString)
      spark.sparkContext.setLogLevel("WARN")
      // warmup until the core is JIT-compiled (an undersized warmup leaves
      // the regex-heavy core interpreted through the measurement and the
      // numbers bimodal) — then best-of-2 timed runs
      Bench.extractionThroughput(spark, 6000, cpus * 2)
      val d = math.max(
        Bench.extractionThroughput(spark, n, cpus * 2),
        Bench.extractionThroughput(spark, n, cpus * 2))
      spark.stop()
      d
    }

    val nCores = if (args.length > 1) args(1).toInt else 4
    val dN = run(nCores)
    val d4N = run(nCores * 4)
    val efficiency = (d4N / dN) / 4.0
    println(f"""{"metric":"scaling_efficiency","value":$efficiency%.3f,"cores_n":$nCores,"cores_4n":${nCores * 4},"docs_per_sec_n":$dN%.1f,"docs_per_sec_4n":$d4N%.1f,"n_docs":$n,"target":0.8}""")
  }
}
