package graft.core

import org.apache.spark.sql.SparkSession
import graft.core.text.Bpe

/** Reproduces `Bpe.DefaultMerges`: learns 24 merges from the documents
  * vocabulary of the given sfDir and prints them as the Scala literal
  * pinned in Bpe.scala. Deterministic: word counts are exact aggregates
  * and ties break lexicographically.
  */
object BpeLearnMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .appName("bpe-learn").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val merges = Bpe.learn(counts, 24)
    println("  val DefaultMerges: Seq[(String, String)] = Seq(")
    println(merges.map { case (a, b) => s"""    ("$a", "$b")""" }.mkString(",\n"))
    println("  )")
    spark.stop()
  }
}
