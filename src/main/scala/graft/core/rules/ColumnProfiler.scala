package graft.core.rules

/** F3 — table structure analysis (semantics of
  * /root/reference/invoice_processor.py:593-669), output string preserved
  * byte-for-byte including its quirks:
  *
  *  - rows are lines where `'|' in line && line.split('|').length > 3`
  *    (bare '|' split, not " | ");
  *  - the numeric profile records `float(firstMatch.group(1))` of
  *    `\d+(\.\d+)?` — i.e. the FRACTIONAL part (".45" → 0.45); integer
  *    cells contribute nothing (reference :627-630 uses the capture
  *    group, not the whole match);
  *  - only columns with index < len(headers) are profiled.
  */
object ColumnProfiler {
  private val numRe = java.util.regex.Pattern.compile("\\d+(\\.\\d+)?")

  /** Python-float-repr-compatible rendering for the simple decimals this
    * profile produces (0.45 → "0.45", 12.0 → "12.0").
    */
  private def pyFloat(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e16) s"${d.toLong}.0" else d.toString

  def profile(text: String): String = {
    val lines = text.split("\n", -1)
    var inTable = false
    var headers: Array[String] = Array.empty
    val tableRows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    // col index -> (min, max)
    val numeric = scala.collection.mutable.LinkedHashMap.empty[Int, (Double, Double)]

    lines.foreach { line =>
      if (line.contains("|") && line.split("\\|", -1).length > 3) {
        val cells = line.split("\\|", -1).map(_.trim)
        if (!inTable) { inTable = true; headers = cells; tableRows += cells }
        else {
          tableRows += cells
          var i = 0
          while (i < cells.length) {
            if (i < headers.length) {
              val m = numRe.matcher(cells(i))
              if (m.find() && m.group(1) != null && m.group(1).nonEmpty) {
                val v = m.group(1).toDouble
                numeric.get(i) match {
                  case Some((mn, mx)) => numeric(i) = (math.min(mn, v), math.max(mx, v))
                  case None => numeric(i) = (v, v)
                }
              }
            }
            i += 1
          }
        }
      }
    }

    val sb = new java.lang.StringBuilder
    if (tableRows.length > 1) {
      sb.append("Found columns: ")
        .append(tableRows.head.filter(_.nonEmpty).map(h => "\"" + h + "\"").mkString(", "))
        .append("\n\n")
      sb.append("Column type suggestions based on patterns:\n")
      tableRows.head.zipWithIndex.foreach { case (header, i) =>
        numeric.get(i).foreach { case (mn, mx) =>
          val colType =
            if (header.contains("BAG") || header.contains("QTY") || header.contains("QUANTITY") || header.contains("PCS"))
              "QUANTITY (count of items/bags)"
            else if (header.contains("PER") && (header.contains("KG") || header.contains("WEIGHT") || header.contains("NET")))
              "WEIGHT PER UNIT"
            else if (header.contains("WEIGHT") || header.contains("NET") || header.contains("KG"))
              "TOTAL WEIGHT"
            else if (header.contains("RATE") || header.contains("PRICE"))
              "RATE (price per unit)"
            else if (header.contains("AMOUNT") || header.contains("TOTAL") || header.contains("VALUE"))
              "AMOUNT (total price)"
            else ""
          sb.append(s"Column '$header': $colType - Value range: ${pyFloat(mn)} to ${pyFloat(mx)}\n")
        }
      }
    }
    sb.toString
  }
}
