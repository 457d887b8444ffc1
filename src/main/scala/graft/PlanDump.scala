package graft

import java.nio.file.{Files, Paths}

/** Optimization-round measurement tool (guide §1.4/§7.2): writes
  * `.explain("formatted")` for named SparkEntry queries to
  * `<outDir>/<name>_<tag>.txt` so plan claims in OPTIMIZATION_r06.md are
  * checkable without running Spark. Not part of the driver contract;
  * Bench.scala is untouched.
  *
  * Usage: PlanDump <sfDir> <outDir> <tag> [query ...]   (no queries = all)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.mkSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
        println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
