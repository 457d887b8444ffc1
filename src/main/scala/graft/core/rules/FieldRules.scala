package graft.core.rules

/** Scalar field rules F5–F12 — exact semantics of the cited reference
  * lines, each a pure function (UTF-8, locale-free, deterministic).
  */
object FieldRules {

  /** F5 — weight→kg conversion (/root/reference/invoice_processor.py:1221-1254).
    * Returns Right(kg) on a successful conversion, Left(original) when the
    * reference would pass the string through unchanged (N/A, no match,
    * unknown unit). The reference's mixed float-or-string return becomes a
    * typed Either; callers keep the original string alongside.
    */
  private val weightRe = java.util.regex.Pattern.compile("(\\d+(?:\\.\\d+)?)\\s*([a-zA-Z]+)")

  def convertWeightToKg(weightStr: String): Either[String, Double] = {
    if (weightStr == null || weightStr == "N/A") return Left(weightStr)
    val s = weightStr.replace(",", "")
    val m = weightRe.matcher(s)
    if (!m.lookingAt()) return Left(weightStr) // re.match anchors at start
    try {
      val v = m.group(1).toDouble
      val unit = m.group(2).toLowerCase(java.util.Locale.ROOT)
      if (unit.contains("qtl")) Right(v * 100)
      else if (unit.contains("ton")) Right(v * 1000)
      else if (unit.contains("kg")) Right(v)
      else Left(weightStr)
    } catch { case _: NumberFormatException => Left(weightStr) }
  }

  /** F6 — date normalization (/root/reference/invoice_processor.py:1013-1062).
    * Quirks preserved: the pre-scrub replaces letters with spaces so the
    * month-name pattern can never fire; the 2-digit pivot applies to the
    * third capture group even for YMD; no zero-padding is added.
    */
  private val dateScrub = java.util.regex.Pattern.compile("[^0-9\\-/.\\\\]")
  private val datePatterns = List(
    "(\\d{1,2})[-/\\\\.](\\d{1,2})[-/\\\\.](\\d{2,4})",
    "(\\d{2,4})[-/\\\\.](\\d{1,2})[-/\\\\.](\\d{1,2})",
    "(\\d{1,2})(?:st|nd|rd|th)?\\s+([A-Za-z]+)[,\\s]+(\\d{2,4})")
    .map(java.util.regex.Pattern.compile)
  private val alphaStart = java.util.regex.Pattern.compile("^[A-Za-z]+")

  def normalizeDate(dateStr0: String): String = {
    if (dateStr0 == null || dateStr0.isEmpty) return dateStr0
    val dateStr = dateScrub.matcher(dateStr0).replaceAll(" ").trim
    val monthNames = Map(
      "january" -> "01", "february" -> "02", "march" -> "03", "april" -> "04",
      "may" -> "05", "june" -> "06", "july" -> "07", "august" -> "08",
      "september" -> "09", "october" -> "10", "november" -> "11", "december" -> "12",
      "jan" -> "01", "feb" -> "02", "mar" -> "03", "apr" -> "04", "jun" -> "06",
      "jul" -> "07", "aug" -> "08", "sep" -> "09", "oct" -> "10", "nov" -> "11", "dec" -> "12")
    datePatterns.foreach { p =>
      val m = p.matcher(dateStr)
      if (m.find()) {
        var g1 = m.group(1); val g2 = m.group(2); var g3 = m.group(3)
        if (g3.length == 2) {
          val y = g3.toInt
          g3 = (if (y < 30) y + 2000 else y + 1900).toString
        }
        val out =
          if (alphaStart.matcher(g2).find()) {
            val month = monthNames.getOrElse(g2.toLowerCase(java.util.Locale.ROOT), "01")
            s"$g1/$month/$g3"
          } else if (g1.length == 4) s"$g3/$g2/$g1"
          else s"$g1/$g2/$g3"
        return out
      }
    }
    dateStr0
  }

  /** F7 — invoice-number scrub (:859-863, :991-997). */
  def scrubInvoiceNumber(s: String): String =
    if (s == null) null else s.replaceAll("[^a-zA-Z0-9]", "")

  /** Invoice number must contain a digit (:855-857). */
  def invoiceNumberHasDigit(s: String): Boolean =
    s != null && s.exists(_.isDigit)

  /** F8 — HSN scrub: digits only, empty→"N/A" (:1067-1072). */
  def scrubHsn(s: String): String = {
    if (s == null) return "N/A"
    val cleaned = s.replaceAll("[^0-9]", "")
    if (cleaned.isEmpty) "N/A" else cleaned
  }

  /** F9 — quantity scrub: keep digits and '.', empty→"N/A" (:1074-1079). */
  def scrubQuantity(s: String): String = {
    if (s == null) return "N/A"
    val cleaned = s.replaceAll("[^0-9.]", "")
    if (cleaned.isEmpty) "N/A" else cleaned
  }

  /** F10 — money-ish scrub: keep digits . , ₹ $ (:1350-1355). Applied to
    * quantity/rate/amount when ≠ "N/A". The multibyte ₹ must survive.
    */
  def scrubMoney(s: String): String =
    if (s == null) null else s.replaceAll("[^0-9.,₹$]", "")

  /** F11 — FSSAI recovery (:999-1011): first match of either pattern. */
  private val fssaiPatterns = List(
    java.util.regex.Pattern.compile("FSSAI\\s*(?:No\\.?|Number\\.?|#)?\\s*:?\\s*(\\d{10,14})", java.util.regex.Pattern.CASE_INSENSITIVE),
    java.util.regex.Pattern.compile("(?:FSSAI|Food License)\\s*:?\\s*(\\d{10,14})", java.util.regex.Pattern.CASE_INSENSITIVE))

  def recoverFssai(text: String): Option[String] = {
    fssaiPatterns.foreach { p =>
      val m = p.matcher(text)
      if (m.find()) return Some(m.group(1))
    }
    None
  }

  /** F12 — company-name recovery (:934-989). Triggered when current name is
    * N/A-ish; scans the first 20 lines with the reference's three pattern
    * families (family 3 is dead against uppercased lines — preserved),
    * special M/S…RICE MILL handling with original-case recovery and a +5
    * score bonus, M/s-prefix re-attachment, longest-candidate argmax
    * (stable sort, Python tie order).
    */
  def shouldRecoverCompany(current: String): Boolean = {
    val c = if (current == null) "" else current
    Set("N/A", "", "NULL").contains(c.trim) || c == "RICE MILL"
  }

  private val companyPatterns = List(
    "M/s\\s+((?:[A-Z][A-Za-z]*\\s*)+(?:RICE MILL|AGRO|INDUSTRIES|PVT\\.? LTD\\.?|LIMITED))",
    "\\b((?:[A-Z][A-Za-z]*\\s*)+(?:RICE MILL|AGRO|INDUSTRIES|PVT\\.? LTD\\.?|LIMITED))\\b",
    "(?:Company|Seller|From):\\s*((?:[A-Z][A-Za-z]*\\s*)+)")
    .map(java.util.regex.Pattern.compile)

  private val msRe = java.util.regex.Pattern.compile(
    "(M/S\\s+(?:[A-Z][A-Za-z]*\\s*)+(?:RICE MILL|AGRO|INDUSTRIES))")

  def recoverCompany(text: String): Option[String] = {
    val lines = text.split("\n", -1).take(20)
    // uppercase each line once (the reference recomputes per use; results
    // are identical, only the allocation count differs)
    val uppers = lines.map(_.toUpperCase(java.util.Locale.ROOT))
    val candidates = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    // A line can only match patterns 1/2 if it contains one of their
    // mandatory suffix literals, and pattern 3 only if it contains its
    // prefix literal — cheap contains-guards that skip the (heavily
    // backtracking) regexes on prose lines without changing any match.
    val suffixTriggers = Array("RICE MILL", "AGRO", "INDUSTRIES", "PVT", "LIMITED")
    val prefixTriggers = Array("COMPANY:", "SELLER:", "FROM:")
    val canMatch12 = uppers.map(u => suffixTriggers.exists(u.contains))
    val canMatch3 = uppers.map(u => prefixTriggers.exists(u.contains))

    companyPatterns.zipWithIndex.foreach { case (p, pi) =>
      var li = 0
      while (li < lines.length) {
        val line = lines(li)
        val upperLine = uppers(li)
        val guard = if (pi < 2) canMatch12(li) else canMatch3(li)
        if (upperLine.contains("M/S") && upperLine.contains("RICE MILL")) {
          val mm = msRe.matcher(upperLine)
          if (mm.find()) {
            val g = mm.group(1)
            val startIdx = upperLine.indexOf(g)
            if (startIdx >= 0) {
              val company = line.substring(startIdx, math.min(line.length, startIdx + g.length))
              candidates += ((company, company.length + 5))
            }
          }
        }
        val m = p.matcher(if (guard) upperLine else "")
        while (m.find()) {
          val g1 = m.group(1)
          val startIdx = upperLine.indexOf(g1.toUpperCase(java.util.Locale.ROOT))
          if (startIdx >= 0) {
            val endIdx = math.min(line.length, startIdx + g1.length)
            val company = line.substring(startIdx, endIdx)
            var msPrefix = ""
            if (startIdx > 4 && upperLine.substring(startIdx - 4, startIdx).contains("M/S")) {
              val from = math.max(0, startIdx - 10)
              val msStart = upperLine.indexOf("M/S", from)
              if (msStart >= 0 && msStart < startIdx)
                msPrefix = line.substring(msStart, startIdx).trim + " "
            }
            val full = msPrefix + company
            candidates += ((full, full.length))
          }
        }
        li += 1
      }
    }
    // stable sort by score desc — Python list.sort is stable
    val sorted = candidates.sortBy(-_._2)
    sorted.headOption.map(_._1)
  }

  /** M/s prefix strip applied in validation (:844). */
  def stripMsPrefix(s: String): String =
    if (s == null) null else s.replaceFirst("^M/s\\s+", "")
}
