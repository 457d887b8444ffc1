package graft.core.rules

/** F1 — structural pattern identification
  * (semantics of /root/reference/invoice_processor.py:307-408).
  *
  * Detects semantic columns from the first table's header row by substring
  * vote (first-match-wins `elif` order preserved exactly), scores every
  * TablePattern as `confidence × headersFound/len(headers)` over the
  * upper-cased full text, and formats the pattern key.
  */
object PatternClassifier {

  final case class DetectedColumns(
      quantityCol: Option[String] = None,
      weightCol: Option[String] = None,
      rateCol: Option[String] = None,
      amountCol: Option[String] = None,
      descCol: Option[String] = None) {
    def nonEmpty: Boolean =
      quantityCol.nonEmpty || weightCol.nonEmpty || rateCol.nonEmpty || amountCol.nonEmpty || descCol.nonEmpty
  }

  private val qtyTerms = List("QTY", "QUANTITY", "BAGS", "NOS", "PIECES", "PCS", "COUNT")
  private val weightTerms = List("WEIGHT", "WT", "KG", "NET", "QUINTAL", "QTL", "MT", "TON")
  private val rateTerms = List("RATE", "PRICE", "UNIT PRICE", "/KG", "/QTL", "/BAG", "PER")
  private val amountTerms = List("AMOUNT", "TOTAL", "VALUE", "AMT")
  private val descTerms = List("DESC", "ITEM", "PRODUCT", "COMMODITY", "PARTICULARS")

  /** Column-role detection over header cells — first-match-wins across the
    * role chain; later headers of the same role overwrite earlier ones
    * (dict-assignment semantics of the reference).
    */
  def detectColumns(headers: Seq[String]): DetectedColumns = {
    var d = DetectedColumns()
    headers.foreach { h =>
      if (qtyTerms.exists(h.contains)) d = d.copy(quantityCol = Some(h))
      else if (weightTerms.exists(h.contains)) d = d.copy(weightCol = Some(h))
      else if (rateTerms.exists(h.contains)) d = d.copy(rateCol = Some(h))
      else if (amountTerms.exists(h.contains)) d = d.copy(amountCol = Some(h))
      else if (descTerms.exists(h.contains)) d = d.copy(descCol = Some(h))
    }
    d
  }

  /** @return (patternKey, confidence) */
  def classify(text: String): (String, Double) =
    classify(text, TableParser.parse(text))

  /** Variant taking pre-parsed tables (the orchestrator parses once and
    * shares the result across classify + both extraction passes).
    */
  def classify(text: String, tables: List[List[List[String]]]): (String, Double) = {
    val upper = text.toUpperCase(java.util.Locale.ROOT)
    val detected: DetectedColumns =
      tables.headOption.flatMap(_.headOption) match {
        case Some(headerRow) =>
          detectColumns(headerRow.filter(_.nonEmpty).map(_.toUpperCase(java.util.Locale.ROOT)))
        case None => DetectedColumns()
      }

    var bestPattern = "generic"
    var bestConfidence = 0.0
    var bestTablePattern: Option[TablePattern] = None
    Patterns.invoicePatterns.foreach { case (name, tablePatterns) =>
      tablePatterns.foreach { tp =>
        val found = tp.headers.count(h => upper.contains(h.toUpperCase(java.util.Locale.ROOT)))
        if (tp.headers.nonEmpty) {
          val conf = tp.confidence * found.toDouble / tp.headers.length
          if (conf > bestConfidence) {
            bestConfidence = conf; bestPattern = name; bestTablePattern = Some(tp)
          }
        }
      }
    }

    if (detected.nonEmpty) {
      val q = detected.quantityCol.getOrElse("QUANTITY")
      val w = detected.weightCol.getOrElse("WEIGHT")
      val r = detected.rateCol.getOrElse("RATE")
      (s"$bestPattern:$q:$w:$r", math.max(bestConfidence, 0.4))
    } else bestTablePattern match {
      case Some(tp) if bestConfidence > 0.3 =>
        tp.quantityCol match {
          case Some(q) =>
            val w = tp.weightCol.getOrElse("WEIGHT")
            (s"$bestPattern:$q:$w", bestConfidence)
          case None =>
            val headersStr = tp.headers.take(3).map(_.replace(" ", "_")).mkString("-")
            (s"$bestPattern:$headersStr", bestConfidence)
        }
      case _ => ("generic", math.max(bestConfidence, 0.3))
    }
  }
}
