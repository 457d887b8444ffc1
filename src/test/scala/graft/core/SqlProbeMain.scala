package graft.core

/** Throwaway SQL semantics probe (kept out of the suite; run via Test/runMain). */
object SqlProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q => println(q); spark.sql(q).show(false) }
    spark.stop()
  }
}
