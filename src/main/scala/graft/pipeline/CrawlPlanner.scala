package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The crawl-side composition: what should the NEXT fetch wave contain?
  *
  *   discover   — sitemap entries per host ([[graft.core.html.SitemapXml]])
  *   consent    — robots.txt longest-match decisions (RFC 9309,
  *                [[graft.core.html.RobotsTxt]])
  *   novelty    — drop urls the committed corpus already holds
  *                ([[SeenUrls]]: Bloom-routed, anti-join-confirmed)
  *   politeness — per-host waves, at most `perWave` fetches per host per
  *                wave (window partitioned BY HOST — per-host state never
  *                converges on one task)
  *
  * Each stage is the operator its oracled query pins (q85/q83/q84/q86);
  * this object is their production composition, the same way
  * CuratedPipeline composes the corpus-side operators. Scale shape: the
  * per-host tables (sitemap xml, robots txt) are broadcast; the only
  * corpus-sized work is the seen-set confirmation, already fpp-routed.
  */
object CrawlPlanner {

  final case class PlanStats(
      discovered: Long, blocked: Long, alreadySeen: Long,
      scheduled: Long, maxWaves: Long)

  /** @param sites    one row per host: (host, sitemap_xml, robots_txt)
    * @param corpusDir committed extract table (the seen-set source)
    * @param perWave  politeness budget: fetches per host per wave
    * @return (plan, stats) — plan rows: (host, url, wave)
    */
  def plan(spark: SparkSession, sites: DataFrame, corpusDir: String,
      perWave: Int = 3): (DataFrame, PlanStats) = {
    import graft.functions.GraftFunctions

    // discover: every sitemap entry, keyed back to its host
    val discovered = sites
      .select(col("host"), col("robots_txt"),
        explode(GraftFunctions.sitemapEntries(col("sitemap_xml"))).as("e"))
      .select(col("host"), col("robots_txt"), col("e.loc").as("url"))

    // consent: path-part of the url against the host's robots rules.
    // Persisted: every stat and the downstream stages read this frame,
    // and without the pin each action would re-run sitemap parse +
    // robots decisions from the scan (the corpus-sized seen-set work
    // would rerun too, via `fresh` below).
    val path = regexp_replace(col("url"), "^[a-z][a-z0-9+.-]*://[^/]*", "")
    val consented = discovered
      .withColumn("__path", when(length(path) === 0, "/").otherwise(path))
      .withColumn("__allowed", GraftFunctions.robotsAllowed(col("robots_txt"), col("__path")))
      .persist()
    val nDiscovered = consented.count()
    val allowed = consented.filter(col("__allowed")).select(col("host"), col("url"))
    val nAllowed = allowed.count()

    // novelty: Bloom-routed frontier check against the committed corpus —
    // the only corpus-sized stage; persisted so the schedule and the
    // stats pay it once
    val fresh = SeenUrls.filterNew(spark, corpusDir, allowed).persist()
    val nFresh = fresh.count()

    // politeness: rank within host (url tie-break = determinism), cap
    // perWave fetches per host per wave
    val w = Window.partitionBy(col("host")).orderBy(col("url"))
    val planned = fresh
      .withColumn("__rn", row_number().over(w))
      .withColumn("wave", expr(s"(__rn - 1) div $perWave"))
      .drop("__rn")
    val maxWaves = planned.agg(coalesce(max(col("wave")), lit(-1L))).head().getLong(0) + 1
    consented.unpersist()

    (planned, PlanStats(nDiscovered, nDiscovered - nAllowed,
      nAllowed - nFresh, nFresh, maxWaves))
  }
}
