package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SeenUrlsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("seen-urls-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bloom-routed frontier check equals the plain anti-join exactly") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-seen").toString
    // commit 600 pages, then present a batch of 1000 (600 re-crawls + 400 new)
    val committed = ExtractStage.generatePages(spark, 600, partitions = 8)
    ExtractPipeline.run(spark, committed, out, numBuckets = 8, snapshotGroups = 2, runId = "seen")
    val batch = ExtractStage.generatePages(spark, 1000, partitions = 8).toDF()

    val bf = SeenUrls.build(spark, out, expectedItems = 2000, fpp = 0.01)
    // a bloom filter NEVER false-negatives: every committed url must probe true
    committed.toDF().select("url").as[String].collect()
      .foreach(u => assert(bf.mightContainString(u), s"false negative: $u"))

    val viaBloom = SeenUrls.filterNew(spark, out, batch)
      .select("url").as[String].collect().toSet
    val viaAntiJoin = batch.join(
      ExtractPipeline.readOutput(spark, out).select("url").distinct(),
      Seq("url"), "left_anti").select("url").as[String].collect().toSet
    assert(viaBloom == viaAntiJoin, "sketch routing must not change the answer")
    assert(viaBloom.size == 400)

    // the routing itself: new urls that pass the filter gate skip the
    // corpus entirely; the confirmed slice is small (fpp-bounded, with
    // slack for a 400-url sample)
    val (definiteNew, maybeSeen) = SeenUrls.splitByFilter(spark, bf, batch)
    assert(definiteNew.count() + maybeSeen.count() == 1000)
    val falsePositives = maybeSeen.count() - 600 // true re-crawls
    assert(falsePositives <= 40, s"fpp blowout: $falsePositives of 400")

    // persistence round-trip: a fresh load answers identically
    val loaded = SeenUrls.load(spark, out).get
    committed.toDF().select("url").as[String].collect()
      .foreach(u => assert(loaded.mightContainString(u)))
  }
}
