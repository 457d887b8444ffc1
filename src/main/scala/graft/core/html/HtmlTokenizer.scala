package graft.core.html

/** Streaming HTML tokenizer — hand-written, zero dependencies (no jsoup in
  * this sandbox and the north rule wants a from-scratch tokenizer anyway).
  *
  * Emits a flat token stream (StartTag / EndTag / Text / Comment); the block
  * segmenter consumes it without ever materializing a DOM tree. Handles the
  * messy-web cases the fixtures pin: unclosed tags, attributes with/without
  * quotes, CDATA-ish script/style raw text, character/entity references,
  * and invalid UTF-8 (decoded with U+FFFD replacement — fixed policy per
  * SURVEY.md §7.6).
  */
object HtmlTokenizer {
  sealed trait Token
  final case class StartTag(name: String, attrs: List[(String, String)], selfClosing: Boolean) extends Token
  final case class EndTag(name: String) extends Token
  /** Raw text with entities already decoded. */
  final case class Text(text: String) extends Token

  /** Elements whose content is raw text (no nested markup). */
  private val rawTextTags = Set("script", "style", "noscript", "textarea", "title")

  /** Decode bytes as UTF-8 with U+FFFD replacement (deterministic policy). */
  def decodeUtf8(bytes: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  /** Minimal, fixed entity table (deterministic; covers the generator's
    * alphabet plus the common web set) + numeric references.
    */
  private val entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "trade" -> "™", "deg" -> "°",
    "plusmn" -> "±", "times" -> "×", "divide" -> "÷",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢", "sect" -> "§", "para" -> "¶",
    "middot" -> "·", "laquo" -> "«", "raquo" -> "»",
    "bull" -> "•", "dagger" -> "†", "permil" -> "‰",
    "prime" -> "′", "Prime" -> "″", "frasl" -> "⁄",
    "minus" -> "−", "lowast" -> "∗", "sim" -> "∼",
    "ne" -> "≠", "le" -> "≤", "ge" -> "≥",
    "larr" -> "←", "uarr" -> "↑", "rarr" -> "→",
    "darr" -> "↓", "harr" -> "↔",
  )

  /** Decode &name;, &#nnn;, &#xhhh; references in `s`. Unknown names pass
    * through verbatim (browser-like leniency, deterministic).
    */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        // named refs are short (≤10 incl. '&'); numeric refs may carry long
        // digit runs that must still resolve (to U+FFFD when out of range)
        if (semi > i && (semi - i <= 10 ||
            (s.charAt(i + 1) == '#' && semi - i <= 32))) {
          val body = s.substring(i + 1, semi)
          // HTML5 numeric-reference replacement: NUL, surrogates, and
          // out-of-range code points become U+FFFD (browsers never emit a
          // raw NUL or unpaired surrogate into the DOM); non-numeric
          // bodies stay literal text
          def appendNumeric(digits: String, radix: Int): Boolean =
            try {
              val cp = java.lang.Long.parseLong(digits, radix)
              if (cp < 0) false
              else if (cp == 0L || (cp >= 0xD800L && cp <= 0xDFFFL) || cp > 0x10FFFFL) {
                sb.append('�'); true
              } else { sb.appendCodePoint(cp.toInt); true }
            } catch { case _: NumberFormatException => false }
          if (body.startsWith("#x") || body.startsWith("#X")) {
            if (appendNumeric(body.substring(2), 16)) i = semi + 1
            else { sb.append(c); i += 1 }
          } else if (body.startsWith("#")) {
            if (appendNumeric(body.substring(1), 10)) i = semi + 1
            else { sb.append(c); i += 1 }
          } else entities.get(body) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None      => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Case-insensitive indexOf without allocating a lowercased copy. */
  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val n = hay.length; val m = needle.length
    var i = math.max(0, from)
    while (i <= n - m) {
      var j = 0
      while (j < m && Character.toLowerCase(hay.charAt(i + j)) == Character.toLowerCase(needle.charAt(j))) j += 1
      if (j == m) return i
      i += 1
    }
    -1
  }

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'

  /** Streaming consumer — lets the block segmenter run without
    * materializing a token Vector (or attribute lists it never reads):
    * the hot path allocates only the text strings themselves.
    */
  trait TokenSink {
    def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit
    def endTag(name: String): Unit
    def text(t: String): Unit
  }

  /** Tokenize into a materialized token stream (tests / tooling). */
  def tokenize(html: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    tokenizeInto(html, new TokenSink {
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit =
        out += StartTag(name, attrs, selfClosing)
      def endTag(name: String): Unit = out += EndTag(name)
      def text(t: String): Unit = out += Text(t)
    }, materializeAttrs = true)
    out.result()
  }

  /** Single-pass O(n) scanner feeding `sink`. When `materializeAttrs` is
    * false, attributes are scanned (to advance correctly) but not
    * allocated.
    */
  def tokenizeInto(html: String, sink: TokenSink, materializeAttrs: Boolean): Unit = {
    val n = html.length
    var i = 0
    var textStart = 0

    def flushText(until: Int): Unit =
      if (until > textStart) sink.text(decodeEntities(html.substring(textStart, until)))

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val next = html.charAt(i + 1)
        if (next == '!') {
          // comment, doctype, or CDATA — skipped entirely
          flushText(i)
          if (html.startsWith("<!--", i)) {
            // HTML5 comment ends: <!--> and <!---> are complete abruptly-
            // closed empty comments (the dashes of <!-- double as closing
            // dashes), and --!> closes a comment too ("incorrectly closed
            // comment" parse error — browsers recover by closing)
            if (html.startsWith(">", i + 4)) i += 5
            else if (html.startsWith("->", i + 4)) i += 6
            else {
              val e1 = html.indexOf("-->", i + 4)
              // a --!> close only matters if it appears BEFORE the -->, so
              // bound its scan at e1 — an unbounded indexOf would rescan to
              // EOF for every well-formed comment (O(comments × page))
              val lim = (if (e1 < 0) n else e1) - 3
              var e2 = -1
              var k = i + 4
              while (e2 < 0 && k < lim) {
                if (html.charAt(k) == '-' && html.charAt(k + 1) == '-' &&
                    html.charAt(k + 2) == '!' && html.charAt(k + 3) == '>') e2 = k
                k += 1
              }
              i = if (e2 >= 0) e2 + 4 else if (e1 < 0) n else e1 + 3
            }
          } else {
            val end = html.indexOf('>', i)
            i = if (end < 0) n else end + 1
          }
          textStart = i
        } else if (next == '?') { // processing instruction
          flushText(i)
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
          textStart = i
        } else if (next == '/' || next.isLetter) {
          flushText(i)
          val isEnd = next == '/'
          var j = if (isEnd) i + 2 else i + 1
          val nameStart = j
          while (j < n && isNameChar(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          if (name.isEmpty) { // '<' / '</' with no tag name — literal text
            // text up to i was already flushed: advance textStart so the
            // next flush starts at the '<' (not re-emitting what came
            // before — '</>'-style junk must not duplicate the page text)
            textStart = i
            i += 1
          } else {
            // scan attributes up to '>'
            val attrs = if (materializeAttrs) List.newBuilder[(String, String)] else null
            var selfClosing = false
            var done = false
            while (!done && j < n) {
              while (j < n && html.charAt(j).isWhitespace) j += 1
              if (j < n && html.charAt(j) == '>') { done = true; j += 1 }
              else if (j + 1 < n && html.charAt(j) == '/' && html.charAt(j + 1) == '>') {
                selfClosing = true; done = true; j += 2
              } else if (j < n) {
                val aStart = j
                while (j < n && !html.charAt(j).isWhitespace && html.charAt(j) != '=' && html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
                val aNameEnd = j
                var vStart = -1; var vEnd = -1
                while (j < n && html.charAt(j).isWhitespace) j += 1
                if (j < n && html.charAt(j) == '=') {
                  j += 1
                  while (j < n && html.charAt(j).isWhitespace) j += 1
                  if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                    val q = html.charAt(j); j += 1
                    vStart = j
                    while (j < n && html.charAt(j) != q) j += 1
                    vEnd = math.min(j, n)
                    if (j < n) j += 1
                  } else {
                    vStart = j
                    while (j < n && !html.charAt(j).isWhitespace && html.charAt(j) != '>') j += 1
                    vEnd = j
                  }
                }
                if (aNameEnd > aStart) {
                  if (materializeAttrs) {
                    val aName = html.substring(aStart, aNameEnd).toLowerCase(java.util.Locale.ROOT)
                    val aVal = if (vStart >= 0) decodeEntities(html.substring(vStart, vEnd)) else ""
                    attrs += (aName -> aVal)
                  }
                } else j += 1 // stray char; make progress
              }
            }
            i = j
            textStart = i
            if (isEnd) sink.endTag(name)
            else {
              sink.startTag(name, if (materializeAttrs) attrs.result() else Nil, selfClosing)
              // raw-text elements: consume content without tokenizing markup
              if (!selfClosing && rawTextTags.contains(name)) {
                // the close tag must END the name ('</script' + '>' or
                // whitespace or '/'), else '</scripty>' would close early
                val closer = "</" + name
                var end = indexOfIgnoreCase(html, closer, i)
                while (end >= 0 && end + closer.length < n && {
                  val c2 = html.charAt(end + closer.length)
                  !(c2 == '>' || c2 == '/' || c2.isWhitespace)
                }) end = indexOfIgnoreCase(html, closer, end + 1)
                if (end >= 0) {
                  if (end > i) sink.text(html.substring(i, end)) // raw, no entity decode
                  val gt = html.indexOf('>', end)
                  sink.endTag(name)
                  i = if (gt < 0) n else gt + 1
                } else {
                  if (n > i) sink.text(html.substring(i, n))
                  i = n
                }
                textStart = i
              }
            }
          }
        } else { i += 1 } // '<' followed by junk — literal text
      } else i += 1
    }
    flushText(n)
  }
}
