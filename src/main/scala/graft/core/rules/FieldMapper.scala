package graft.core.rules

import graft.core.{ExtractionRecord, Product}

/** The deterministic replacement for the reference's LLM extraction stage.
  *
  * The reference routes documents to special prompt branches by text
  * predicates (F20, /root/reference/invoice_processor.py:450-457) and the
  * prompts encode explicit column-mapping rules (:461-552: BAGS→quantity,
  * NET→weight, "NET (Kg) PER BAG" excluded, agro QUANTITY-in-MT). Here
  * those predicates become the rule router and the prompt rules become
  * explicit, testable field mappings — no network, no nondeterminism.
  */
object FieldMapper {

  sealed trait Format
  case object ProblematicFormat extends Format // Birla-style BAGS/NET/Rate
  case object AgroFormat extends Format        // AM-AGRO BAG/PKG/QUANTITY/PER
  case object GenericFormat extends Format

  /** F20 predicates, exact substrings and boolean structure (:450-457).
    * Python precedence: `A or B and C` == `A or (B and C)`.
    */
  def sniff(text: String): Format = {
    val isProblematic = text.contains("NET (Kg) PER BAG") || text.contains("BIRLA RICE") ||
      text.contains("NET (KG)") || text.contains("PER BAG") ||
      (text.contains("BAGS") && text.contains("NET") && text.contains("RATE"))
    val isAgro = (text.contains("BAG") && text.contains("PKG") && text.contains("QUANTITY") && text.contains("PER")) ||
      text.contains("A M AGRO") || text.contains("AGRO INDUSTRIES")
    if (isProblematic) ProblematicFormat
    else if (isAgro) AgroFormat
    else GenericFormat
  }

  /** Header-row index of the first header matching any term (contains,
    * case-insensitive over upper-cased headers), excluding indices for
    * which `exclude` holds.
    */
  private def findCol(headers: Array[String], terms: List[String],
      exclude: String => Boolean = _ => false): Int = {
    var i = 0
    while (i < headers.length) {
      val h = headers(i)
      if (!exclude(h) && terms.exists(h.contains)) return i
      i += 1
    }
    -1
  }

  private def cell(row: List[String], i: Int): String =
    if (i >= 0 && i < row.length && row(i).trim.nonEmpty) row(i).trim else "N/A"

  /** Extract products from one parsed table (header row + data rows). */
  def mapTable(table: List[List[String]], format: Format): List[Product] = {
    if (table.length < 2) return Nil
    val headers = table.head.map(_.trim.toUpperCase(java.util.Locale.ROOT)).toArray
    val rows = table.tail

    val descIdx = findCol(headers, List("DESC", "ITEM", "PRODUCT", "COMMODITY", "PARTICULARS", "GOODS"))
    val hsnIdx = findCol(headers, List("HSN", "SAC"))

    val (qtyIdx, weightIdx, rateIdx, amountIdx, weightUnitSuffix, qtySuffix) = format match {
      case ProblematicFormat =>
        // BAGS→quantity; NET→weight (NOT "NET … PER BAG"); Rate→rate
        val q = findCol(headers, List("BAGS", "QTY", "QUANTITY", "NOS", "PIECES", "PCS"),
          exclude = h => h.contains("PER BAG") || h.contains("PER UNIT"))
        val w = findCol(headers, List("NET", "WEIGHT", "QUINTAL", "QTL", "KG"),
          exclude = h => h.contains("PER BAG") || h.contains("PER UNIT"))
        val r = findCol(headers, List("RATE", "PRICE"))
        val a = findCol(headers, List("AMOUNT", "TOTAL", "VALUE", "AMT"))
        (q, w, r, a, " kg", "")
      case AgroFormat =>
        // QUANTITY (in MT) is the real quantity; BAG is packaging count
        val q = findCol(headers, List("QUANTITY"))
        val q2 = if (q >= 0) q else findCol(headers, List("QTY", "BAG"))
        val w = -1 // no explicit weight column in this format
        val r = findCol(headers, List("RATE", "PRICE"))
        val a = findCol(headers, List("AMOUNT", "TOTAL", "VALUE", "AMT"))
        (q2, w, r, a, "", " MT")
      case GenericFormat =>
        val q = findCol(headers, List("QTY", "QUANTITY", "BAGS", "NOS", "PIECES", "PCS", "COUNT"))
        val w = findCol(headers, List("WEIGHT", "WT", "KG", "NET", "QUINTAL", "QTL", "MT", "TON"),
          exclude = h => h.contains("PER BAG") || h.contains("PER UNIT"))
        val r = findCol(headers, List("RATE", "PRICE", "UNIT PRICE", "/KG", "/QTL", "/BAG", "PER"))
        val a = findCol(headers, List("AMOUNT", "TOTAL", "VALUE", "AMT"))
        (q, w, r, a, "", "")
    }

    rows.flatMap { row =>
      val desc = cell(row, if (descIdx >= 0) descIdx else 0)
      val up = row.mkString(" ").toUpperCase(java.util.Locale.ROOT)
      // skip total/footer rows that leak into the parsed table
      val isFooter = List("TOTAL", "GRAND TOTAL", "SUBTOTAL", "AMOUNT IN WORDS").exists(up.contains)
      if (isFooter || desc == "N/A") None
      else {
        val rawWeight = cell(row, weightIdx)
        val weight =
          if (rawWeight != "N/A" && weightUnitSuffix.nonEmpty && rawWeight.forall(c => c.isDigit || c == '.' || c == ','))
            rawWeight + weightUnitSuffix
          else rawWeight
        val rawQty = cell(row, qtyIdx)
        val qty =
          if (rawQty != "N/A" && qtySuffix.nonEmpty && rawQty.forall(c => c.isDigit || c == '.' || c == ','))
            rawQty + qtySuffix
          else rawQty
        Some(Product(
          goodsDescription = desc,
          hsnSacCode = cell(row, hsnIdx),
          quantity = qty,
          weight = weight,
          originalWeight = weight,
          weightInKg = None,
          rate = cell(row, rateIdx),
          amount = cell(row, amountIdx)))
      }
    }
  }

  /** Full deterministic extraction over the text IR: header fields from the
    * PATTERNS regexes, products from the parsed tables (F2 first, the F4
    * locator's pipe-less region as fallback).
    */
  def extract(text: String, format: Format): ExtractionRecord =
    extract(text, format, TableParser.parse(text))

  /** Variant taking pre-parsed tables (parse once per document). */
  def extract(text: String, format: Format,
      tables: List[List[List[String]]]): ExtractionRecord = {
    def firstGroup(p: java.util.regex.Pattern): String = {
      val m = p.matcher(text)
      if (m.find()) m.group(1) else "N/A"
    }
    val company = "N/A" // recovered by CompanyRules in post-processing
    val invoiceNumber = firstGroup(Patterns.invoiceNumber)
    val invoiceDate = firstGroup(Patterns.invoiceDate)
    val fssai = firstGroup(Patterns.fssaiNumber)
    val products: List[Product] =
      if (tables.nonEmpty) tables.flatMap(t => mapTable(t, format))
      else {
        // no explicit table markers: locate the table region (F4) and try
        // pipe-splitting its lines (F3-style detection)
        val region = TableLocator.locate(text)
        val rows = region.split("\n", -1).toList
          .filter(l => l.contains("|") && l.split("\\|", -1).length > 3)
          .map(l => l.split("\\|", -1).map(_.trim).toList)
        if (rows.length >= 2) mapTable(rows, format) else Nil
      }

    ExtractionRecord(
      success = true, error = null, patternUsed = "",
      companyName = company, invoiceNumber = invoiceNumber,
      fssaiNumber = fssai, invoiceDate = invoiceDate,
      products = products, confidence = Map.empty)
  }
}
