package graft.core
import org.apache.spark.sql.SparkSession
object PartCountMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stage = java.nio.file.Files.createTempDirectory("graft-pc").toString
    graft.pipeline.ExtractStage.generatePages(spark, 100000, partitions = 32)
      .write.option("compression","zstd").parquet(s"$stage/pages")
    val files = new java.io.File(s"$stage/pages").listFiles().filter(_.getName.endsWith(".parquet"))
    println(s"[pc] files=${files.length} totalMB=${files.map(_.length).sum/1e6}")
    Seq("128m","8m").foreach { mpb =>
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      val df = spark.read.parquet(s"$stage/pages")
      println(s"[pc] maxPartitionBytes=$mpb -> scan partitions=${df.rdd.getNumPartitions}")
    }
    spark.stop()
  }
}
