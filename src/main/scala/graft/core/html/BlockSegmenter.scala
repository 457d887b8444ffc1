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

  /** Content inside these is dropped entirely (textarea: its raw text is a
    * form field's VALUE, not page content — tokenized correctly as literal
    * text, then excluded here like every other non-content subtree).
    */
  // template: its contents are INERT per HTML5 (parsed into a separate
  // document fragment, never rendered) — a crawl extractor must not emit
  // them as page text
  private val ignorableTags = Set("script", "style", "noscript", "head", "svg", "iframe", "object", "embed", "textarea", "template")

  /** Tags legal inside <head> per the HTML5 tree builder's "in head" mode —
    * any OTHER start tag implicitly closes an open head (</head> is
    * optional in HTML5; browsers pop head at the first flow/body tag).
    */
  private val headMetadataTags = Set(
    "base", "basefont", "bgsound", "link", "meta", "title", "noscript",
    "noframes", "style", "script", "template", "head")

  /** `\s` of java.util.regex — ASCII whitespace only. The hand-rolled
    * normalization below must match `trim + replaceAll("\\s+"," ")` and
    * `split("\\s+")` byte-for-byte (golden fixtures pin this).
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Collapse whitespace runs to single spaces and trim — allocation-lean
    * equivalent of `s.trim.replaceAll("\\s+", " ")` (note: String.trim
    * strips all chars ≤ ' ', a superset of `\s`; replicated exactly).
    */
  private def normalize(s: java.lang.StringBuilder): String = {
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) <= ' ') start += 1
    while (end > start && s.charAt(end - 1) <= ' ') end -= 1
    if (start >= end) return ""
    val out = new java.lang.StringBuilder(end - start)
    var i = start
    var inWs = false
    while (i < end) {
      val c = s.charAt(i)
      if (isWs(c)) { inWs = true }
      else {
        if (inWs && out.length > 0) out.append(' ')
        else if (inWs) out.append(' ') // leading ws impossible post-trim unless non-\s ≤' ' chars; keep exact
        out.append(c)
        inWs = false
      }
      i += 1
    }
    out.toString
  }

  /** Count `split("\\s+")` words of the [start,end) region of `s`. */
  private def countWords(s: String, from: Int, until: Int): Int = {
    var n = 0
    var i = from
    var inWord = false
    while (i < until) {
      if (isWs(s.charAt(i))) inWord = false
      else if (!inWord) { n += 1; inWord = true }
      i += 1
    }
    n
  }

  /** The segmentation state machine as a streaming TokenSink — the hot
    * path runs tokenizer→segmenter fused with no token materialization.
    */
  private final class SegmentSink extends HtmlTokenizer.TokenSink {
    val blocks = Vector.newBuilder[TextBlock]
    private val sb = new java.lang.StringBuilder
    private var linkWords = 0
    private var anchorDepth = 0
    private var ignoreDepth = 0
    private var headingDepth = 0
    private var curTag = "body"
    private var inHead = false

    private def flush(): Unit = {
      val text = normalize(sb)
      if (text.nonEmpty) {
        val w = countWords(text, 0, text.length)
        blocks += TextBlock(curTag, text, w, math.min(linkWords, w),
          textDensity(text), headingDepth)
      }
      sb.setLength(0); linkWords = 0
    }

    def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit = {
      if (inHead && !headMetadataTags.contains(name)) {
        // implicit </head> (HTML5 tree builder): without this, a page that
        // omits </head> keeps ignoreDepth=1 forever and drops its body text
        inHead = false
        if (ignoreDepth > 0) ignoreDepth -= 1
      }
      if (ignorableTags.contains(name) && !selfClosing) {
        if (name == "head") inHead = true
        ignoreDepth += 1
      }
      else if (blockTags.contains(name)) {
        flush()
        curTag = name
        if (name.length == 2 && name.charAt(0) == 'h' && name.charAt(1) >= '1' && name.charAt(1) <= '6')
          headingDepth = name.charAt(1) - '0'
      } else if (name == "a" && !selfClosing) anchorDepth += 1
    }

    def endTag(name: String): Unit =
      if (name == "head") {
        // only decrement for a head that is actually open — a stray
        // </head> after the implicit close must not eat another
        // ignorable's depth (e.g. an open noscript)
        if (inHead) { inHead = false; if (ignoreDepth > 0) ignoreDepth -= 1 }
      }
      else if (ignorableTags.contains(name)) { if (ignoreDepth > 0) ignoreDepth -= 1 }
      else if (blockTags.contains(name)) {
        flush()
        // only a real heading close (h1-h6) clears heading state — '</hr>'
        // from WYSIWYG output must not
        if (name.length == 2 && name.charAt(0) == 'h' && name.charAt(1) >= '1' && name.charAt(1) <= '6')
          headingDepth = 0
        curTag = "body"
      } else if (name == "a") { if (anchorDepth > 0) anchorDepth -= 1 }

    def text(t: String): Unit =
      if (ignoreDepth == 0) {
        // trim bounds without allocating the trimmed copy
        var ts = 0; var te = t.length
        while (ts < te && t.charAt(ts) <= ' ') ts += 1
        while (te > ts && t.charAt(te - 1) <= ' ') te -= 1
        if (te > ts) {
          val w = countWords(t, ts, te)
          if (anchorDepth > 0) linkWords += w
          if (sb.length > 0) sb.append(' ')
          sb.append(t, ts, te)
        }
      }

    def result(): Vector[TextBlock] = { flush(); blocks.result() }
  }

  def segment(html: String): Vector[TextBlock] = {
    val sink = new SegmentSink
    HtmlTokenizer.tokenizeInto(html, sink, materializeAttrs = false)
    sink.result()
  }

  /** Token-Vector entry point (tests / tooling). */
  def segmentTokens(tokens: Vector[HtmlTokenizer.Token]): Vector[TextBlock] = {
    import HtmlTokenizer._
    val sink = new SegmentSink
    tokens.foreach {
      case StartTag(name, attrs, selfClosing) => sink.startTag(name, attrs, selfClosing)
      case EndTag(name) => sink.endTag(name)
      case Text(t) => sink.text(t)
    }
    sink.result()
  }

  /** Words per line after greedy 80-column wrapping (the paper's proxy for
    * rendered text density, independent of any real layout engine).
    * Input is whitespace-normalized (single spaces), so word iteration is
    * a space scan — no regex, no array allocation.
    */
  def textDensity(text: String): Double = {
    if (text.isEmpty) return 0.0
    var col = 0
    var fullLines = 0
    var wordsOnFullLines = 0
    var wordsOnLine = 0
    var totalWords = 0
    var i = 0
    val n = text.length
    while (i < n) {
      var j = text.indexOf(' ', i)
      if (j < 0) j = n
      val wlen = j - i
      if (wlen > 0) {
        totalWords += 1
        val add = if (col == 0) wlen else wlen + 1
        if (col + add > 80 && col > 0) {
          fullLines += 1; wordsOnFullLines += wordsOnLine
          col = wlen; wordsOnLine = 1
        } else { col += add; wordsOnLine += 1 }
      }
      i = j + 1
    }
    if (totalWords == 0) 0.0
    else if (fullLines > 0) wordsOnFullLines.toDouble / fullLines
    else totalWords.toDouble
  }
}
