package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table-input benchmark: the production job shape — read a pages parquet
  * table, extract, write zstd parquet output. Unlike the fused synthetic
  * bench (ScalingBench), this pays the real scan + output-write cost, so
  * it is the honest per-node throughput number for cluster sizing.
  *
  * Usage: TableBench [nPages] [cores]
  */
object TableBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val cores = if (args.length > 1) args(1) else "16"
    val spark = Bench.mkSession(cores)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val stage = java.nio.file.Files.createTempDirectory("graft-tablebench").toString
    // stage the input table (not timed)
    graft.pipeline.ExtractStage.generatePages(spark, n, partitions = cores.toInt * 2)
      .write.option("compression", "zstd").parquet(s"$stage/pages")
    val inBytes = spark.read.parquet(s"$stage/pages")
      .agg(sum(length($"html"))).first().getLong(0)

    // warmup JIT on a slice (not timed)
    graft.pipeline.ExtractStage.run(
      spark.read.parquet(s"$stage/pages").limit(12000).as[graft.pipeline.Page])
      .filter("success").count()

    // best-of-3: the host steals cores and stalls fresh memory commits in
    // bursts (BENCH.md); best-of measures the job, not the neighbor
    val secs = (0 until 3).map { r =>
      val t0 = System.nanoTime()
      val pages = spark.read.parquet(s"$stage/pages").as[graft.pipeline.Page]
      graft.pipeline.ExtractStage.run(pages)
        .write.mode("overwrite").option("compression", "zstd")
        .option("parquet.block.size", (16 * 1024 * 1024).toString)
        .parquet(s"$stage/out")
      (System.nanoTime() - t0) / 1e9
    }
    val sec = secs.min

    val outRows = spark.read.parquet(s"$stage/out").count()
    println(f"""{"metric":"table_throughput","docs_per_sec":${n / sec}%.1f,"mb_per_sec":${inBytes / sec / 1e6}%.1f,"n_docs":$n,"out_rows":$outRows,"cores":$cores,"wall_sec":$sec%.1f,"all_secs":[${secs.map(s => f"$s%.1f").mkString(",")}]}""")

    // cleanup staged data
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(stage))
    spark.stop()
  }
}
