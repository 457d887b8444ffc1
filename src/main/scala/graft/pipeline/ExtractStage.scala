package graft.pipeline

import graft.core.ExtractCore
import org.apache.spark.sql.{Dataset, SparkSession}

/** The extract stage: `Dataset[Page] → Dataset[ExtractedPage]` via
  * `mapPartitions` (amortizes nothing today — the core is static and
  * allocation-free to set up — but keeps the per-partition batching shape
  * the 100 TB posture wants, and is where per-partition metrics hook in).
  *
  * Per-row try/catch inside the core (C4 isolation): data errors become
  * `success=false` rows, never task failures.
  */
object ExtractStage {

  def processOne(p: Page): ExtractedPage = {
    val r = ExtractCore.processPage(p.html, p.text)
    val rec = r.record
    ExtractedPage(
      url = p.url,
      warc_ts = p.warc_ts,
      lang = p.lang,
      success = rec.success,
      error = rec.error,
      pattern_used = rec.patternUsed,
      extracted_text = r.extractedText,
      spans = r.spans.map(s => SpanRow(s.label, s.start, s.end)),
      company_name = rec.companyName,
      invoice_number = rec.invoiceNumber,
      fssai_number = rec.fssaiNumber,
      invoice_date = rec.invoiceDate,
      products = rec.products.map(p => ProductRow(
        p.goodsDescription, p.hsnSacCode, p.quantity, p.weight,
        p.originalWeight, p.weightInKg, p.rate, p.amount)),
      confidence = rec.confidence,
      text_length = r.extractedText.length,
      n_products = rec.products.length,
      title = r.head.title,
      // canonical hrefs are routinely RELATIVE; only the resolved absolute
      // form is comparable across pages (raw "/x" on two hosts must not
      // collide in the dedup pass). A <base href> overrides the page URL
      // as the resolution base, itself resolved first (it may be relative)
      canonical_url = r.head.canonical.map { href =>
        val base = r.head.baseHref
          .map(graft.core.html.UrlResolver.resolve(p.url, _))
          .filter(_.nonEmpty).getOrElse(p.url)
        graft.core.html.UrlResolver.resolve(base, href)
      }.getOrElse(""),
      noindex = r.head.noindex)
  }

  def run(pages: Dataset[Page]): Dataset[ExtractedPage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.mapPartitions(_.map(processOne))
  }

  /** Generate the deterministic pages table as a Dataset (distributed: each
    * row is a pure function of its index — no driver-side materialization).
    */
  def generatePages(spark: SparkSession, n: Long, seed: Long = PageGen.DefaultSeed,
      partitions: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map(i => PageGen.page(seed, i))
  }

  /** Fused generate→extract in a single narrow stage: skips the
    * intermediate Page encoder round-trip (html bytes would be serialized
    * to UnsafeRow and immediately deserialized). For table-backed runs use
    * `run(pages)`; this is the synthetic-ingest fast path the benchmarks
    * use.
    */
  def generateAndExtract(spark: SparkSession, n: Long,
      seed: Long = PageGen.DefaultSeed, partitions: Int = 32): Dataset[ExtractedPage] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions)
      .mapPartitions(_.map(i => processOne(PageGen.page(seed, i))))
  }
}
