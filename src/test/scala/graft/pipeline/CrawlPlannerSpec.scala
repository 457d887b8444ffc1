package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CrawlPlannerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("crawl-planner-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("discover -> consent -> novelty -> politeness composes correctly") {
    import spark.implicits._
    // committed corpus: pages 0..99 of the standard generator
    val out = Files.createTempDirectory("graft-crawlplan").toString
    val committed = ExtractStage.generatePages(spark, 100, partitions = 4)
    ExtractPipeline.run(spark, committed, out, numBuckets = 8, snapshotGroups = 2, runId = "cp")
    val committedUrls = committed.toDF().select("url").as[String].collect().toSet

    // one synthetic site: its sitemap lists 40 committed urls (stale),
    // 30 fresh /new/ urls, and 30 fresh /private/ urls its robots blocks
    val host = graft.core.html.LinkExtractor.hostOf(PageGen.url(PageGen.DefaultSeed, 0L))
    val staleUrls = committedUrls.toSeq.sorted.take(40)
    val freshNew = (0 until 30).map(i => s"https://$host/new/p$i")
    val freshBlocked = (0 until 30).map(i => s"https://$host/private/p$i")
    val xml = "<urlset>" + (staleUrls ++ freshNew ++ freshBlocked)
      .map(u => s"<url><loc>$u</loc></url>").mkString + "</urlset>"
    val robots = "User-agent: *\nDisallow: /private/"
    val sites = Seq((host, xml, robots)).toDF("host", "sitemap_xml", "robots_txt")

    val (plan, stats) = CrawlPlanner.plan(spark, sites, out, perWave = 4)

    assert(stats.discovered == 100)
    assert(stats.blocked == 30, "robots must drop exactly the /private/ urls")
    assert(stats.alreadySeen == 40, "committed urls are not re-crawled")
    assert(stats.scheduled == 30)
    assert(stats.maxWaves == 8, "30 urls at 4 per wave = 8 waves") // ceil(30/4)

    val rows = plan.select($"url", $"wave").as[(String, Long)].collect()
    assert(rows.map(_._1).toSet == freshNew.toSet)
    // politeness: at most perWave urls in any (host, wave)
    val perWaveCounts = rows.groupBy(_._2).map(_._2.length)
    assert(perWaveCounts.forall(_ <= 4))
    assert(rows.map(_._2).max == 7)
    // deterministic: replanning yields the identical schedule
    val (plan2, stats2) = CrawlPlanner.plan(spark, sites, out, perWave = 4)
    assert(stats2 == stats)
    assert(plan2.select($"url", $"wave").as[(String, Long)].collect().sorted
      .sameElements(rows.sorted))
  }
}
