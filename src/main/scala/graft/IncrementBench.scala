package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.CuratedPipeline

/** Measures the incremental-curation claim directly: per-batch
  * `curateIncrement` cost should stay ~flat as the corpus grows, while a
  * full `run` over the union grows with corpus size — the difference is
  * what makes daily curation of a 100 TB corpus feasible at all.
  *
  * Corpus: deterministic synthetic docs; ids in the same ÷5 group share
  * identical text for ~2/7 of ids (exact-dup clusters spanning batch
  * boundaries, so increments exercise cross-batch collisions and
  * demotions, not just appends), the rest unique.
  *
  * Usage: IncrementBench [seedDocs] [batchDocs] [nBatches] [cores]
  * Prints one JSON line with per-increment seconds and the full-recompute
  * seconds over the same final corpus.
  */
object IncrementBench {

  def docs(spark: SparkSession, from: Long, until: Long): DataFrame =
    spark.range(from, until).select(
      col("id"),
      concat(lit("doc://"), col("id")).as("url"),
      lit("2025-06-01 00:00:00").cast("timestamp").as("warc_ts"),
      expr(
        // ~2/7 of ids draw their text from their ÷5 group seed → exact-dup
        // clusters; the rest are unique 30-word docs
        "concat_ws(' ', transform(sequence(1, 30), i -> " +
          "substr(md5(concat(cast(CASE WHEN id % 7 < 2 THEN id div 5 ELSE id END AS string), '_', cast(i AS string))), 1, 8)))")
        .as("text"))

  def main(args: Array[String]): Unit = {
    val seedN = if (args.length > 0) args(0).toLong else 120000L
    val batchN = if (args.length > 1) args(1).toLong else 15000L
    val nBatches = if (args.length > 2) args(2).toInt else 3
    val cores = if (args.length > 3) args(3) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-increment-bench")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val incDir = java.nio.file.Files.createTempDirectory("graft-incbench").toString
    val seedSec = timed {
      CuratedPipeline.run(spark, docs(spark, 0, seedN), incDir,
        idCol = "id", textCol = "text", numBuckets = 32, snapshotGroups = 1,
        runId = "seed")
    }
    val incSecs = (0 until nBatches).map { k =>
      val from = seedN + k * batchN
      timed {
        CuratedPipeline.curateIncrement(spark,
          docs(spark, from, from + batchN), incDir,
          idCol = "id", textCol = "text", numBuckets = 32, runId = s"b$k")
      }
    }
    val total = seedN + nBatches * batchN
    val fullDir = java.nio.file.Files.createTempDirectory("graft-incbench-full").toString
    val fullSec = timed {
      CuratedPipeline.run(spark, docs(spark, 0, total), fullDir,
        idCol = "id", textCol = "text", numBuckets = 32, snapshotGroups = 1,
        runId = "full")
    }
    // sanity: the incrementally-built corpus equals the full recompute
    val incKept = CuratedPipeline.readKept(spark, incDir).count()
    val fullKept = CuratedPipeline.readKept(spark, fullDir).count()
    require(incKept == fullKept, s"kept mismatch: $incKept != $fullKept")

    val incJson = incSecs.map(s => f"$s%.2f").mkString("[", ",", "]")
    println(f"""{"metric":"increment_bench","seed_docs":$seedN,"seed_sec":$seedSec%.2f,"batch_docs":$batchN,"increment_secs":$incJson,"full_docs":$total,"full_recompute_sec":$fullSec%.2f,"kept":$incKept,"cores":"$cores"}""")
    spark.stop()
  }
}
