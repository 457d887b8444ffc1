package graft.core

import graft.core.html.{Boilerplate, Span}
import graft.core.pdf.PdfTextExtractor
import graft.core.rules._

/** Result of processing one page: main-content text + spans (the north-rule
  * invariant surface) plus the typed extraction record (reference parity)
  * and the head metadata a crawl pipeline acts on (canonical / robots —
  * parsed from the same decoded bytes, empty for PDFs and fallback docs).
  */
final case class PageResult(
    extractedText: String,
    spans: Vector[Span],
    record: ExtractionRecord,
    head: graft.core.html.HeadMeta = graft.core.html.HeadMeta("", None, noindex = false, nofollow = false))

/** The per-document driver (C3 — semantics of
  * /root/reference/invoice_processor.py:1257-1389, re-architected):
  *
  *  1. payload → text IR: `%PDF-` payloads through the hand-written PDF
  *     extractor, everything else through the HTML boilerplate pipeline;
  *     empty result falls back to the page's `text` column (S4 fallback
  *     policy, :271-273 — OCR replaced per SURVEY.md §2.1 S3).
  *  2. pattern classification (F1).
  *  3. deterministic field extraction — a 2-pass rule cascade replacing the
  *     LLM retry loop (C1): sniffed-format rules first, generic rules if
  *     validation fails (mirrors the generic-pattern fallback :1295-1297).
  *  4. post-processing (company/FSSAI recovery, date normalization,
  *     scrubbers) and confidence scoring (F16).
  *
  * Pure and allocation-bounded: O(one page) memory, no wall clock, no
  * shared state — safe to run inside `mapPartitions` at any parallelism.
  */
object ExtractCore {

  private val emptyHead =
    graft.core.html.HeadMeta("", None, noindex = false, nofollow = false)

  /** Extract the text IR + spans from raw payload bytes. */
  def extractText(html: Array[Byte], fallbackText: String): (String, Vector[Span]) = {
    val (t, s, _) = extractTextAndHead(html, fallbackText)
    (t, s)
  }

  /** As [[extractText]], plus the head metadata (canonical link, robots
    * directives, title) parsed from the SAME charset-sniffed decode — one
    * decode pass serves both the boilerplate pipeline and the head scan.
    * PDFs and fallback-text docs carry no head.
    */
  def extractTextAndHead(html: Array[Byte], fallbackText: String): (String, Vector[Span], graft.core.html.HeadMeta) = {
    val (text, spans, head) =
      if (html == null || html.isEmpty) ("", Vector.empty[Span], emptyHead)
      else if (PdfTextExtractor.isPdf(html)) {
        val t = PdfTextExtractor.extract(html)
        (t, if (t.isEmpty) Vector.empty[Span] else Vector(Span("pdf", 0, t.length)), emptyHead)
      } else {
        // charset-sniffed decode (BOM → meta prescan → UTF-8 fallback):
        // identical to the old UTF-8-only policy for every UTF-8 page,
        // correct for the windows-1252/shift-jis/... slice of a real crawl
        val decoded = graft.core.html.CharsetSniffer.decode(html)
        val ex = Boilerplate.extract(decoded)
        (ex.text, ex.spans, graft.core.html.HeadMeta.parse(decoded))
      }
    if (text.trim.nonEmpty) (text, spans, head)
    else if (fallbackText != null && fallbackText.trim.nonEmpty)
      (fallbackText, Vector(Span("fallback", 0, fallbackText.length)), head)
    else ("", Vector.empty, head)
  }

  /** Post-processing pass (semantics of post_process_extraction,
    * /root/reference/invoice_processor.py:920-1081).
    */
  def postProcess(rec0: ExtractionRecord, text: String): ExtractionRecord = {
    var rec = rec0

    // company-name recovery (F12)
    if (FieldRules.shouldRecoverCompany(rec.companyName))
      FieldRules.recoverCompany(text).foreach(c => rec = rec.copy(companyName = c))

    // invoice-number scrub (F7)
    if (rec.invoiceNumber != null && rec.invoiceNumber.nonEmpty)
      rec = rec.copy(invoiceNumber = FieldRules.scrubInvoiceNumber(rec.invoiceNumber))

    // FSSAI recovery (F11)
    if (rec.fssaiNumber == null || rec.fssaiNumber.isEmpty || rec.fssaiNumber == "N/A")
      FieldRules.recoverFssai(text).foreach(f => rec = rec.copy(fssaiNumber = f))

    // date normalization (F6)
    if (rec.invoiceDate != null && rec.invoiceDate.nonEmpty)
      rec = rec.copy(invoiceDate = FieldRules.normalizeDate(rec.invoiceDate))

    // product cleanup (F8, F9)
    rec.copy(products = rec.products.map { p =>
      p.copy(
        hsnSacCode = FieldRules.scrubHsn(p.hsnSacCode),
        quantity = FieldRules.scrubQuantity(p.quantity))
    })
  }

  /** Numeric cleanup + weight conversion applied after confidence
    * (reference :1342-1355 runs these inside process_invoice).
    */
  private def finalizeProducts(rec: ExtractionRecord): ExtractionRecord =
    rec.copy(products = rec.products.map { p =>
      val withWeight = FieldRules.convertWeightToKg(p.weight) match {
        case Right(kg) => p.copy(originalWeight = p.weight, weightInKg = Some(kg))
        case Left(_)   => p.copy(originalWeight = p.weight, weightInKg = None)
      }
      def clean(v: String): String =
        if (v != null && v != "N/A") FieldRules.scrubMoney(v) else v
      withWeight.copy(
        quantity = clean(withWeight.quantity),
        rate = clean(withWeight.rate),
        amount = clean(withWeight.amount))
    })

  /** F16 — confidence scoring (:1329-1339). */
  def confidence(rec: ExtractionRecord): Map[String, Double] = {
    def score(v: String): Double = if (v != null && v != "N/A") 0.9 else 0.0
    val base = Map(
      "company_name" -> score(rec.companyName),
      "invoice_number" -> score(rec.invoiceNumber),
      "fssai_number" -> score(rec.fssaiNumber),
      "invoice_date" -> score(rec.invoiceDate),
      "products" -> math.min(0.9, 0.2 * rec.products.length))
    base + ("overall" -> base.values.sum / base.size)
  }

  /** Full per-page pipeline. Never throws on data errors: any exception
    * becomes a `success=false` record (C4 per-row isolation, app.py:117-122).
    */
  def processPage(html: Array[Byte], fallbackText: String): PageResult =
    try {
      val (text, spans, head) = extractTextAndHead(html, fallbackText)
      if (text.trim.isEmpty)
        return PageResult("", spans, ExtractionRecord.failure("Could not extract text from PDF"), head)

      // parse the table sections once; classifier and both extraction
      // passes share the result (was 3 parses of the same text)
      val tables = rules.TableParser.parse(text)
      val (patternKey, _) = PatternClassifier.classify(text, tables)

      // pass 1: sniffed-format rules; pass 2: generic fallback on invalid
      val format = FieldMapper.sniff(text)
      val first = Validator.validate(FieldMapper.extract(text, format, tables))
      val chosen =
        if (first.isValid || format == FieldMapper.GenericFormat) first
        else {
          val second = Validator.validate(FieldMapper.extract(text, FieldMapper.GenericFormat, tables))
          if (second.isValid) second else first
        }

      var rec = postProcess(chosen.record, text)
      rec = rec.copy(patternUsed = patternKey, success = true,
        confidence = confidence(rec))
      rec = finalizeProducts(rec)
      PageResult(text, spans, rec, head)
    } catch {
      // NonFatal only: OOM/Interrupted must stay task failures (Spark
      // retries them) — converting them to data rows would silently lose
      // pages on a degraded executor
      case scala.util.control.NonFatal(e) =>
        val msg = if (e.getMessage != null) e.getMessage else e.toString
        PageResult("", Vector.empty, ExtractionRecord.failure(msg))
    }
}
