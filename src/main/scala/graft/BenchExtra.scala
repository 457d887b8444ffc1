package graft

/** Optimization-round measurement tool (guide §1.1/§1.4): times NAMED
  * SparkEntry queries in isolation, several reps each, with either the
  * bench's `.count()` action (default, comparable to Bench.scala) or the
  * noop sink (computes every column, no sink cost). Prints one JSON line
  * per query with the raw rep samples. Not part of the driver contract;
  * Bench.scala and its methodology are untouched.
  *
  * Usage: BenchExtra <sfDir> <reps> <count|noop> <query> [query ...]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val mode = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.mkSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // same JIT warmup as Bench so the first extract-path query is not
    // charged compiler time
    graft.pipeline.ExtractStage
      .generateAndExtract(spark, 6000, partitions = cpus.toInt * 2)
      .select("success").filter("success").count()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val samples = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        if (mode == "noop") df.write.format("noop").mode("overwrite").save()
        else df.count()
        (System.nanoTime() - t0) / 1e9
      }
      val js = samples.map(s => f"$s%.3f").mkString("[", ",", "]")
      println(s"""{"query":"$name","mode":"$mode","samples":$js}""")
    }
    spark.stop()
  }
}
