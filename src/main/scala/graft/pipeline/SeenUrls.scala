package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import org.apache.spark.util.sketch.BloomFilter

/** The crawl-frontier seen-set: "which of this batch's URLs are new?"
  *
  * At 10^12 committed documents the exact answer is an anti-join against
  * the whole corpus — correct but expensive to run per ingest batch. The
  * standard discipline (every large crawler's frontier) is a Bloom-filter
  * PRE-FILTER with an exact CONFIRMATION:
  *
  *   - urls the filter has definitely never seen (no false negatives by
  *     construction) are new, full stop — no corpus access at all;
  *   - the `mightContain` remainder — the true re-crawls plus an ~fpp
  *     sliver of false positives — is the only slice that pays the exact
  *     anti-join.
  *
  * The result is EXACTLY the anti-join semantics (the sketch only routes
  * work, it never decides), with corpus-side I/O cut to O(fpp × batch)
  * instead of O(batch) probe rows against the full url set. The filter
  * itself is mergeable (one per partition, OR-folded), KBs–GBs for
  * billions of keys at 1% fpp, and persists next to the table manifest so
  * a resumed ingest loads it instead of rescanning the corpus.
  */
object SeenUrls {

  /** Build the filter from the committed table's urls and persist it.
    * Mergeable build: Spark's `stat.bloomFilter` aggregates per-partition
    * sketches, so the corpus is scanned once, url column only.
    */
  def build(spark: SparkSession, outDir: String,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): BloomFilter = {
    val urls = ExtractPipeline.readOutput(spark, outDir).select("url")
    val bf = urls.stat.bloomFilter("url", expectedItems, fpp)
    val path = new Path(s"$outDir/_seen/bloom.bin")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try bf.writeTo(out) finally out.close()
    bf
  }

  /** Load the persisted filter (None if never built). */
  def load(spark: SparkSession, outDir: String): Option[BloomFilter] = {
    val path = new Path(s"$outDir/_seen/bloom.bin")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try Some(BloomFilter.readFrom(in)) finally in.close()
    }
  }

  /** Split a batch into (definitely-new, maybe-seen) by the sketch. The
    * filter is broadcast once; the predicate is a per-row probe.
    */
  def splitByFilter(spark: SparkSession, bf: BloomFilter, batch: DataFrame,
      urlCol: String = "url"): (DataFrame, DataFrame) = {
    val bfBc = spark.sparkContext.broadcast(bf)
    val might = udf((u: String) => u != null && bfBc.value.mightContainString(u))
    (batch.filter(!might(col(urlCol))), batch.filter(might(col(urlCol))))
  }

  /** The full frontier check: rows of `batch` whose url is NOT in the
    * committed table — bloom-routed, anti-join-confirmed, EXACTLY equal
    * to the plain anti-join (SeenUrlsSpec proves the equality; the q84
    * oracle pins it against DuckDB).
    */
  def filterNew(spark: SparkSession, outDir: String, batch: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val bf = load(spark, outDir).getOrElse(build(spark, outDir))
    val (definiteNew, maybeSeen) = splitByFilter(spark, bf, batch, urlCol)
    val committed = ExtractPipeline.readOutput(spark, outDir)
      .select(col("url").as(urlCol)).distinct()
    // only the maybe-seen sliver (~fpp of a fresh batch) probes the corpus
    val confirmedNew = maybeSeen.join(committed, Seq(urlCol), "left_anti")
    definiteNew.unionByName(confirmedNew)
  }
}
