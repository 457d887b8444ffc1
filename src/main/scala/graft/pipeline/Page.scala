package graft.pipeline

/** The input-table row — exactly the shape mandated by the driver contract
  * (/root/repo/BASELINE.json input_hint):
  * `url:string, warc_ts:timestamp, html:binary, text:string, lang:string`.
  */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Output row of the extract stage. */
final case class ExtractedPage(
    url: String,
    warc_ts: java.sql.Timestamp,
    lang: String,
    success: Boolean,
    error: String,
    pattern_used: String,
    extracted_text: String,
    spans: Seq[SpanRow],
    company_name: String,
    invoice_number: String,
    fssai_number: String,
    invoice_date: String,
    products: Seq[ProductRow],
    confidence: Map[String, Double],
    text_length: Int,
    n_products: Int,
    // head metadata the curation stage acts on: the site-declared dup
    // signal and the owner's indexing opt-out ("" / false for PDFs and
    // fallback-text docs)
    title: String,
    canonical_url: String,
    noindex: Boolean)

final case class SpanRow(label: String, start: Int, end: Int)

final case class ProductRow(
    goods_description: String,
    hsn_sac_code: String,
    quantity: String,
    weight: String,
    original_weight: String,
    weight_in_kg: Option[Double],
    rate: String,
    amount: String)
