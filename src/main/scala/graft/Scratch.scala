package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway profiling main for the optimization round. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.mkSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val marker = when(col("lang") === "en", lit(" the and of with good water house"))
      .when(col("lang") === "fr", lit(" le et de avec très bonne eau maison où"))
      .when(col("lang") === "de", lit(" der und von mit für gute wasser haus über"))
      .when(col("lang") === "es", lit(" el y de con muy buena agua casa señor"))
      .otherwise(lit(" 的 和 很 好 水 房子 在 是"))
    (0 until 3).foreach { rep =>
      val grams = spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("tt", lower(concat(col("text"), marker)))
        .filter(length(col("tt")) >= 3)
        .select(col("doc_id"), col("lang"),
          explode(expr("transform(sequence(1, length(tt)-2), i -> substring(tt, i, 3))")).as("tg"))
      time(s"grams count rep$rep") { grams.count() }
      val train = grams.filter(pmod(col("doc_id"), lit(5)) < 4)
      val profile = time(s"profile cp rep$rep") {
        train.groupBy(col("lang").as("plang"), col("tg"))
          .agg(count(lit(1)).as("cnt")).localCheckpoint(true)
      }
      println("[scratch] profile rows=" + profile.count())
      val totals = profile.groupBy(col("plang")).agg(sum(col("cnt")).as("tot"))
      val freq = profile.join(totals, "plang")
        .select(col("plang"), col("tg"), expr("(cnt * 1000000L) div tot").as("ppm"))
      val test = grams.filter(pmod(col("doc_id"), lit(5)) === 4)
      val scores = test.join(broadcast(freq), "tg")
        .groupBy(col("doc_id"), col("lang"), col("plang"))
        .agg(sum(col("ppm")).as("score"))
      time(s"scores rep$rep") { scores.write.format("noop").mode("overwrite").save() }
      val guessed = scores.withColumn("rn",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("plang"))))
        .filter(col("rn") === 1)
      time(s"full rep$rep") {
        guessed.groupBy(col("lang"), col("plang").as("guess"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("guess")).count()
      }
    }
    spark.stop()
  }
}
