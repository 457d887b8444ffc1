package graft.core.html

/** Span of a kept block inside the extracted text (char offsets, end
  * exclusive). Labels are the block's originating tag.
  */
final case class Span(label: String, start: Int, end: Int)

final case class HtmlExtraction(text: String, spans: Vector[Span], blocks: Vector[TextBlock], contentFlags: Vector[Boolean])

/** Main-content extraction: classify each text block as content vs
  * boilerplate with the NumWords/LinkDensity decision rules of
  * Kohlschütter et al. (WSDM 2010), then join the content blocks.
  *
  * This replaces the reference's pdfplumber text scan + the implicit
  * "the whole PDF is content" assumption (reference has no HTML path at
  * all; the capability mapping is SURVEY.md §2.1 S1/S4 → this stage).
  * Decision thresholds are the published classifier constants —
  * deterministic, no tuning, no model file.
  */
object Boilerplate {

  /** Classify the block at `i` given its neighbors (quote-free re-derivation
    * of the published NumWordsRules decision tree).
    */
  def isContent(prev: Option[TextBlock], cur: TextBlock, next: Option[TextBlock]): Boolean = {
    val prevWords = prev.map(_.words).getOrElse(0)
    val nextWords = next.map(_.words).getOrElse(0)
    val prevLink = prev.map(_.linkDensity).getOrElse(0.0)
    if (cur.linkDensity > 0.333333) false
    else if (prevLink <= 0.555556) {
      if (cur.words > 16) true
      else if (nextWords > 15) true
      else prevWords > 4
    } else {
      if (cur.words > 40) true
      else nextWords > 17
    }
  }

  /** Headings adjacent to content are kept (title recovery) — a common
    * post-rule in densitometric extractors; deterministic.
    */
  private def promoteHeadings(blocks: Vector[TextBlock], flags: Array[Boolean]): Unit = {
    var i = 0
    while (i < blocks.length) {
      if (!flags(i) && blocks(i).headingDepth > 0 && blocks(i).linkDensity <= 0.333333) {
        var j = i + 1
        var sawContent = false
        while (j < blocks.length && j <= i + 2 && !sawContent) {
          if (flags(j)) sawContent = true
          j += 1
        }
        if (sawContent) flags(i) = true
      }
      i += 1
    }
  }

  /** Block-proximity fusion (Boilerpipe-style post-filter, re-derived): a
    * non-link-dense block wedged between two content blocks is content —
    * recovers short structured lines (table headers, `Field : value` rows)
    * that the word-count rules drop. Fixpoint so chains of length 1 fill
    * from both sides.
    */
  private def fuseGaps(blocks: Vector[TextBlock], flags: Array[Boolean]): Unit = {
    var changed = true
    while (changed) {
      changed = false
      var i = 1
      while (i < blocks.length - 1) {
        if (!flags(i) && blocks(i).linkDensity <= 0.333333 && flags(i - 1) && flags(i + 1)) {
          flags(i) = true; changed = true
        }
        i += 1
      }
    }
  }

  def extract(html: String): HtmlExtraction = {
    val blocks = BlockSegmenter.segment(html)
    val flags = new Array[Boolean](blocks.length)
    var i = 0
    while (i < blocks.length) {
      val prev = if (i > 0) Some(blocks(i - 1)) else None
      val next = if (i + 1 < blocks.length) Some(blocks(i + 1)) else None
      flags(i) = isContent(prev, blocks(i), next)
      i += 1
    }
    promoteHeadings(blocks, flags)
    fuseGaps(blocks, flags)

    val sb = new java.lang.StringBuilder
    val spans = Vector.newBuilder[Span]
    var first = true
    i = 0
    while (i < blocks.length) {
      if (flags(i)) {
        if (!first) sb.append('\n')
        val start = sb.length
        sb.append(blocks(i).text)
        spans += Span(blocks(i).tag, start, sb.length)
        first = false
      }
      i += 1
    }
    HtmlExtraction(sb.toString, spans.result(), blocks, flags.toVector)
  }
}
