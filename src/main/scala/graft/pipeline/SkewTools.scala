package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for host-keyed operations (SURVEY.md §7.4): web hosts are
  * Zipf-distributed, so any host-keyed shuffle (per-host aggregation,
  * per-host dedup, politeness grouping) has hot keys. The pattern:
  *
  *  1. find the hot keys on a cheap sample (driver gets a small list);
  *  2. broadcast that list (it rides along in the task closure);
  *  3. salt ONLY the hot keys (cold keys keep 1 partition — no extra
  *     shuffle width where it isn't needed);
  *  4. aggregate in two phases (salted partial → de-salted final).
  *
  * For url-keyed work no salting is needed — the pipeline's
  * `pmod(xxhash64(url), B)` bucket key is uniform by construction.
  */
object SkewTools {

  /** Authority part of a url, any scheme (the ONE host definition shared
    * by skew profiling, crawl planning, and template stripping — three
    * sites diverging on port/userinfo handling would silently disagree).
    */
  def hostOf(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1)

  /** Hot keys = keys holding more than `threshold` of the sampled rows.
    * Sampling is deterministic (seeded) — resume-safe.
    */
  def hotKeys(df: DataFrame, key: Column, sampleFraction: Double = 0.05,
      threshold: Double = 0.01, seed: Long = 42L): Seq[String] = {
    val sampled = if (sampleFraction >= 1.0) df else df.sample(withReplacement = false, sampleFraction, seed)
    val total = sampled.count().max(1L)
    sampled.groupBy(key.as("k")).count()
      .filter(col("count") > total * threshold)
      .select("k").collect().map(_.getString(0)).toSeq.sorted
  }

  /** Salted key: hot keys get `salts` sub-keys, cold keys keep one.
    * Deterministic per row (hash of the row key), not random — identical
    * plans produce identical partitioning.
    */
  def saltedKey(key: Column, hot: Seq[String], salts: Int, rowDiscriminator: Column): Column =
    when(key.isin(hot: _*),
      concat(key, lit("#"), pmod(xxhash64(rowDiscriminator), lit(salts)).cast("string")))
      .otherwise(key)

  /** Two-phase aggregation over a skewed key: count + sum metrics per key,
    * hot keys pre-aggregated across `salts` partitions. Result is
    * identical to a direct groupBy (tested) — only the shuffle profile
    * differs (no single reducer receives a whole hot key).
    */
  def skewAwareAgg(df: DataFrame, key: Column, valueCol: Column,
      hot: Seq[String], salts: Int = 8, rowDiscriminator: Column): DataFrame = {
    df.withColumn("__salted", saltedKey(key, hot, salts, rowDiscriminator))
      .withColumn("__key", key)
      .groupBy(col("__salted"), col("__key"))
      .agg(count(lit(1)).as("__c"), sum(valueCol).as("__s"))
      .groupBy(col("__key").as("key"))
      .agg(sum(col("__c")).as("n"), sum(col("__s")).as("total"))
  }
}
