package graft.core.html

/** A contiguous run of text between block-level tag boundaries, with the
  * densitometric features used for boilerplate classification.
  *
  * Features follow the shallow-text-features method of Kohlschütter,
  * Fankhauser & Nejdl, "Boilerplate Detection using Shallow Text Features"
  * (WSDM 2010) — a published method, re-derived here from the paper, not
  * ported from any implementation.
  *
  * @param tag         dominant enclosing tag when the block opened (lowercase)
  * @param text        whitespace-normalized block text
  * @param words       number of whitespace-separated words
  * @param linkWords   words that appeared inside <a> elements
  * @param textDensity words per wrapped line (80-char greedy wrap, per paper)
  * @param headingDepth 1-6 when inside <h1>..<h6>, else 0
  */
final case class TextBlock(
    tag: String,
    text: String,
    words: Int,
    linkWords: Int,
    textDensity: Double,
    headingDepth: Int) {
  def linkDensity: Double = if (words == 0) 0.0 else linkWords.toDouble / words
}

/** Folds the flat token stream into text blocks. No DOM tree is built —
  * a small tag stack suffices (streaming, O(1) memory per nesting level),
  * which is what lets the extract stage run at O(page) memory inside
  * `mapPartitions` at 100 TB scale.
  */
object BlockSegmenter {
  /** Tags that terminate the current block on open or close. */
  private val blockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "blockquote", "pre", "article", "section",
    "header", "footer", "nav", "aside", "main", "form", "figure",
    "figcaption", "br", "hr", "body", "html", "head", "tbody", "thead",
    "caption", "dl", "dt", "dd", "address", "center", "fieldset", "legend",
    "option", "select", "button")

  /** Content inside these is dropped entirely. */
  private val ignorableTags = Set("script", "style", "noscript", "head", "svg", "iframe", "object", "embed")

  private val wordSplit = "\\s+".r

  def segment(html: String): Vector[TextBlock] = segmentTokens(HtmlTokenizer.tokenize(html))

  def segmentTokens(tokens: Vector[HtmlTokenizer.Token]): Vector[TextBlock] = {
    import HtmlTokenizer._
    val blocks = Vector.newBuilder[TextBlock]
    val sb = new java.lang.StringBuilder
    var words = 0
    var linkWords = 0
    var anchorDepth = 0
    var ignoreDepth = 0
    var headingDepth = 0
    var curTag = "body"

    def flush(): Unit = {
      val text = sb.toString.trim.replaceAll("\\s+", " ")
      if (text.nonEmpty) {
        val w = wordSplit.split(text).count(_.nonEmpty)
        blocks += TextBlock(curTag, text, w, math.min(linkWords, w),
          textDensity(text), headingDepth)
      }
      sb.setLength(0); words = 0; linkWords = 0
    }

    tokens.foreach {
      case StartTag(name, _, selfClosing) =>
        if (ignorableTags.contains(name) && !selfClosing) ignoreDepth += 1
        else if (blockTags.contains(name)) {
          flush()
          curTag = name
          if (name.length == 2 && name.charAt(0) == 'h' && name.charAt(1) >= '1' && name.charAt(1) <= '6')
            headingDepth = name.charAt(1) - '0'
        } else if (name == "a" && !selfClosing) anchorDepth += 1

      case EndTag(name) =>
        if (ignorableTags.contains(name)) { if (ignoreDepth > 0) ignoreDepth -= 1 }
        else if (blockTags.contains(name)) {
          flush()
          if (name.length == 2 && name.charAt(0) == 'h') headingDepth = 0
          curTag = "body"
        } else if (name == "a") { if (anchorDepth > 0) anchorDepth -= 1 }

      case Text(t) =>
        if (ignoreDepth == 0 && t.trim.nonEmpty) {
          val w = wordSplit.split(t.trim).count(_.nonEmpty)
          if (anchorDepth > 0) linkWords += w
          words += w
          if (sb.length > 0) sb.append(' ')
          sb.append(t.trim)
        }
    }
    flush()
    blocks.result()
  }

  /** Words per line after greedy 80-column wrapping (the paper's proxy for
    * rendered text density, independent of any real layout engine).
    */
  def textDensity(text: String): Double = {
    val ws = wordSplit.split(text).filter(_.nonEmpty)
    if (ws.isEmpty) return 0.0
    var lines = 1
    var col = 0
    var fullLines = 0
    var wordsOnFullLines = 0
    var wordsOnLine = 0
    ws.foreach { w =>
      val add = if (col == 0) w.length else w.length + 1
      if (col + add > 80 && col > 0) {
        fullLines += 1; wordsOnFullLines += wordsOnLine
        lines += 1; col = w.length; wordsOnLine = 1
      } else { col += add; wordsOnLine += 1 }
    }
    // last (partial) line excluded when there are wrapped lines, per paper
    if (fullLines > 0) wordsOnFullLines.toDouble / fullLines
    else ws.length.toDouble
  }
}
