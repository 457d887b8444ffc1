package graft.core.rules

/** A structural table pattern: header set + confidence + optional explicit
  * column roles. Mirrors the reference's INVOICE_PATTERNS data
  * (/root/reference/invoice_processor.py:143-198) — data, not code.
  */
final case class TablePattern(
    headers: List[String],
    confidence: Double,
    quantityCol: Option[String] = None,
    weightCol: Option[String] = None,
    bagCol: Option[String] = None)

object Patterns {
  /** Header-field regexes (/root/reference/invoice_processor.py:136-140). */
  val invoiceNumber = java.util.regex.Pattern.compile("Invoice No\\.?\\s*:?\\s*([A-Za-z0-9\\-\\/]+)")
  val invoiceDate   = java.util.regex.Pattern.compile("Date of Invoice\\s*:?\\s*([0-9\\-\\/\\.]+(?:\\s*\\([^)]*\\))?)")
  val fssaiNumber   = java.util.regex.Pattern.compile("FSSAI\\s*:?\\s*([A-Za-z0-9]+)")

  /** Ordered as in the reference dict — iteration order is part of the
    * argmax tie-break semantics (first pattern wins ties because the
    * comparison is strict `>`).
    */
  val invoicePatterns: List[(String, List[TablePattern])] = List(
    "pattern_a" -> List(
      TablePattern(List("DESCRIPTION", "HSN", "QUANTITY", "WEIGHT", "RATE", "AMOUNT"), 0.9),
      TablePattern(List("DESCRIPTION OF GOODS", "HSN", "QTY", "WEIGHT", "RATE", "AMOUNT"), 0.9),
      TablePattern(List("GOODS DESCRIPTION", "HSN/SAC", "QTY", "WEIGHT", "RATE", "AMOUNT"), 0.9),
      TablePattern(List("GOODS", "HSN CODE", "QUANTITY", "WEIGHT", "RATE", "AMOUNT"), 0.9),
      TablePattern(List("DESCRIPTION", "HSN", "BAGS", "WEIGHT", "RATE", "AMOUNT"), 0.9, quantityCol = Some("BAGS"), weightCol = Some("WEIGHT")),
      TablePattern(List("DESCRIPTION", "HSN", "BAGS", "QUINTAL", "RATE", "AMOUNT"), 0.9, quantityCol = Some("BAGS"), weightCol = Some("QUINTAL"))),
    "pattern_b" -> List(
      TablePattern(List("DESCRIPTION", "QUANTITY", "RATE", "AMOUNT"), 0.9),
      TablePattern(List("ITEM", "QTY", "RATE", "AMOUNT"), 0.9),
      TablePattern(List("PARTICULARS", "QUANTITY", "RATE", "VALUE"), 0.9),
      TablePattern(List("GOODS", "QTY", "PRICE", "TOTAL"), 0.9),
      TablePattern(List("PRODUCT", "QUANTITY", "PRICE", "TOTAL"), 0.9)),
    "pattern_c" -> List(
      TablePattern(List("DESCRIPTION", "HSN", "BATCH", "NET", "QUANTITY", "WEIGHT", "RATE"), 0.9),
      TablePattern(List("PRODUCT", "HSN/SAC", "LOT", "QTY", "WEIGHT", "RATE", "AMOUNT"), 0.9),
      TablePattern(List("DESCRIPTION", "HSN", "BATCH", "NET", "BAGS", "WEIGHT", "RATE"), 0.9, quantityCol = Some("BAGS"), weightCol = Some("WEIGHT"))),
    "pattern_d" -> List(
      TablePattern(List("DESCRIPTION", "HSN/SAC", "BATCH", "BAG", "PKG", "QUANTITY", "RATE", "PER", "AMOUNT"), 0.95, quantityCol = Some("QUANTITY"), bagCol = Some("BAG")),
      TablePattern(List("DESCRIPTION OF GOODS", "HSN/SAC", "BATCH", "BAG", "PKG", "QUANTITY", "RATE", "PER", "AMOUNT"), 0.95, quantityCol = Some("QUANTITY"), bagCol = Some("BAG")),
      TablePattern(List("SR", "DESCRIPTION", "HSN/SAC", "BATCH", "BAG", "PKG", "QUANTITY", "RATE", "PER", "AMOUNT"), 0.95, quantityCol = Some("QUANTITY"), bagCol = Some("BAG")),
      TablePattern(List("DESCRIPTION", "HSN/SAC", "BAG", "PKG", "QUANTITY", "RATE", "PER", "AMOUNT"), 0.95, quantityCol = Some("QUANTITY"), bagCol = Some("BAG")),
      TablePattern(List("DESCRIPTION", "HSN/SAC", "BAG", "PKG", "QUANTITY", "RATE", "PER"), 0.95, quantityCol = Some("QUANTITY"), bagCol = Some("BAG"))),
    "generic" -> List(
      TablePattern(List("DESCRIPTION", "QUANTITY", "RATE", "AMOUNT"), 0.7),
      TablePattern(List("ITEM", "QTY", "PRICE", "VALUE"), 0.7),
      TablePattern(List("GOODS", "QUANTITY", "PRICE", "TOTAL"), 0.7)))
}
