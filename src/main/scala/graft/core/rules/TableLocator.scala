package graft.core.rules

/** F4 — table-region location (semantics of
  * /root/reference/invoice_processor.py:1084-1218). This is the
  * reference's main-content-block detector, kept verbatim as a primitive:
  * header-term offset clustering (150-char windows), special-cased
  * "BIRLA RICE" branch, capture until end markers / 2+ blank lines /
  * 20 data rows.
  */
object TableLocator {
  private val commonHeaders = List(
    "DESCRIPTION", "QUANTITY", "QTY", "RATE", "AMOUNT", "PRICE",
    "ITEM", "PRODUCT", "GOODS", "HSN", "SAC", "BAGS", "WEIGHT", "QUINTAL")

  private val endMarkers = List("TOTAL", "GRAND TOTAL", "SUBTOTAL", "AMOUNT IN WORDS")

  // no DOTALL: the reference compiles with re.IGNORECASE only, so its '.'
  // does NOT match newline — the .{0,50} gaps must stay on one line or the
  // branch falls through to the generic cluster path
  private val birlaRe = java.util.regex.Pattern.compile(
    "(DESCRIPTION|PARTICULARS|GOODS).{0,50}(HSN|HSN/SAC).{0,50}(BATCH|BAGS).{0,50}(WEIGHT|QTY)",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  private val headerRes = commonHeaders.map(h =>
    java.util.regex.Pattern.compile("\\b" + java.util.regex.Pattern.quote(h) + "\\b",
      java.util.regex.Pattern.CASE_INSENSITIVE))

  def locate(text: String): String = {
    // all case-insensitive whole-word offsets of common header terms
    val startIndices = scala.collection.mutable.ArrayBuffer.empty[Int]
    headerRes.foreach { p =>
      val m = p.matcher(text)
      while (m.find()) startIndices += m.start()
    }
    if (startIndices.isEmpty) return ""
    val sorted = startIndices.sorted.toArray

    if (text.contains("SHRI BIRLA RICE MILL") || text.contains("BIRLA RICE")) {
      val bm = birlaRe.matcher(text)
      if (bm.find()) {
        val tableStart = math.max(0, bm.start() - 50)
        val section = text.substring(tableStart, math.min(text.length, tableStart + 1000))
        val lines = section.split("\n", -1)
        val tableLines = scala.collection.mutable.ArrayBuffer.empty[String]
        var inTable = false
        var emptyCount = 0
        lines.foreach { line =>
          val up = line.toUpperCase(java.util.Locale.ROOT)
          if (!inTable && List("DESCRIPTION", "HSN", "BATCH", "WEIGHT").exists(up.contains)) {
            inTable = true; tableLines += line
          } else if (inTable) {
            if (line.trim.isEmpty) {
              emptyCount += 1
              if (emptyCount > 2) inTable = false
            } else {
              emptyCount = 0
              tableLines += line
              if (endMarkers.exists(up.contains)) inTable = false
            }
          }
        }
        return tableLines.mkString("\n")
      }
    }

    // generic branch: 150-char clusters, argmax on header count (stable —
    // ties keep the earliest cluster, matching Python's stable sort)
    val clusterSize = 150
    val clusters = sorted.map { cs => (cs, sorted.count(idx => idx >= cs && idx < cs + clusterSize)) }
    val best = clusters.sortBy(c => -c._2).headOption
    best match {
      case Some((clusterStart, _)) =>
        val tableStart = math.max(0, clusterStart - 20)
        val tableEnd = math.min(text.length, tableStart + 1000)
        val lines = text.substring(tableStart, tableEnd).split("\n", -1)
        val tableLines = scala.collection.mutable.ArrayBuffer.empty[String]
        var inTable = false
        var headerLineIdx = -1
        var i = 0
        var break = false
        while (i < lines.length && !break) {
          val line = lines(i)
          val up = line.toUpperCase(java.util.Locale.ROOT)
          val headerCount = commonHeaders.count(up.contains)
          if (headerCount >= 2) { inTable = true; headerLineIdx = i; tableLines += line }
          else if (inTable && i > headerLineIdx) {
            tableLines += line
            if (endMarkers.exists(up.contains)) break = true
            else if (i - headerLineIdx > 20) break = true
          }
          i += 1
        }
        tableLines.mkString("\n")
      case None => ""
    }
  }
}
