package graft.core

import org.apache.spark.sql.SparkSession

/** Isolate Spark-path costs: core-only vs full-encoder extraction. */
object SparkProfileMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 30000L
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $label: ${n / sec}%.0f docs/sec ($sec%.1f s)")
    }

    val parts = cpus.toInt * 2
    // warmup
    graft.pipeline.ExtractStage.generateAndExtract(spark, 1000, partitions = parts).filter("success").count()

    time("core-only (no output encoder)") {
      spark.range(0L, n, 1L, parts).mapPartitions(_.map { i =>
        val p = graft.pipeline.PageGen.page(42L, i)
        val r = ExtractCore.processPage(p.html, p.text)
        if (r.record.success) 1L else 0L
      }).reduce(_ + _)
    }

    time("core-only via RDD API") {
      spark.sparkContext.range(0L, n, 1L, parts).mapPartitions(_.map { i =>
        val p = graft.pipeline.PageGen.page(42L, i)
        val r = ExtractCore.processPage(p.html, p.text)
        if (r.record.success) 1L else 0L
      }).reduce(_ + _)
    }

    time("gen-only") {
      spark.range(0L, n, 1L, parts).mapPartitions(_.map { i =>
        graft.pipeline.PageGen.page(42L, i).html.length.toLong
      }).reduce(_ + _)
    }

    time("full ExtractedPage encoder") {
      graft.pipeline.ExtractStage.generateAndExtract(spark, n, partitions = parts)
        .filter("success").count()
    }

    spark.stop()
  }
}
