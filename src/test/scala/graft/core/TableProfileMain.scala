package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the table-path costs: scan, deserialize, extract, write. */
object TableProfileMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val cores = if (args.length > 1) args(1) else "16"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val stage = java.nio.file.Files.createTempDirectory("graft-tp").toString
    graft.pipeline.ExtractStage.generatePages(spark, n, partitions = cores.toInt * 2)
      .write.option("compression", "zstd").parquet(s"$stage/pages")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[tp] $label: ${n / sec}%.0f docs/sec ($sec%.1f s)")
    }

    // warmup
    graft.pipeline.ExtractStage.run(
      spark.read.parquet(s"$stage/pages").limit(12000).as[graft.pipeline.Page])
      .filter("success").count()

    time("scan only (sum bytes)") {
      spark.read.parquet(s"$stage/pages").agg(sum(length($"html"))).first()
    }
    time("scan + Page deserialize (typed map)") {
      spark.read.parquet(s"$stage/pages").as[graft.pipeline.Page]
        .mapPartitions(_.map(p => p.html.length.toLong)).reduce(_ + _)
    }
    time("scan + extract, count only") {
      graft.pipeline.ExtractStage.run(
        spark.read.parquet(s"$stage/pages").as[graft.pipeline.Page])
        .filter("success").count()
    }
    time("scan + extract, count, maxPartitionBytes=8m") {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
      try graft.pipeline.ExtractStage.run(
        spark.read.parquet(s"$stage/pages").as[graft.pipeline.Page])
        .filter("success").count()
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    }
    time("scan + extract + zstd write") {
      graft.pipeline.ExtractStage.run(
        spark.read.parquet(s"$stage/pages").as[graft.pipeline.Page])
        .write.option("compression", "zstd").parquet(s"$stage/out1")
    }
    time("scan + extract + zstd write, 16MB row groups") {
      graft.pipeline.ExtractStage.run(
        spark.read.parquet(s"$stage/pages").as[graft.pipeline.Page])
        .write.option("compression", "zstd")
        .option("parquet.block.size", (16 * 1024 * 1024).toString)
        .parquet(s"$stage/out3")
    }
    time("scan + extract + snappy write") {
      graft.pipeline.ExtractStage.run(
        spark.read.parquet(s"$stage/pages").as[graft.pipeline.Page])
        .write.option("compression", "snappy").parquet(s"$stage/out2")
    }

    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    rm(new java.io.File(stage))
    spark.stop()
  }
}
