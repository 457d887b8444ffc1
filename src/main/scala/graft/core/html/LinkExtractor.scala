package graft.core.html

/** One outgoing link: absolute target, visible anchor text, and whether
  * the author opted it out of endorsement (`rel=nofollow`).
  */
final case class OutLink(target: String, anchor: String, nofollow: Boolean)

/** Outlink extraction — the signal the whole link-analysis side of a crawl
  * runs on (frontier expansion, host ranking, anchor-text indexing).
  * One [[HtmlTokenizer]] pass: every `<a href>` captured with its visible
  * anchor text (nested markup flattened, whitespace collapsed), resolved
  * to an absolute URL against the page's effective base — `<base href>`
  * wins over the page URL, per HTML — via the RFC 3986 [[UrlResolver]].
  * Anchors inside `<script>/<style>/<template>` never count (inert
  * content, same rule as the block segmenter); fragment-only and
  * non-fetchable schemes (`javascript:`, `mailto:`, `data:`, `tel:`)
  * are dropped at the source.
  */
object LinkExtractor {

  def extract(html: String, pageUrl: String): Vector[OutLink] = {
    val base = HeadMeta.parse(html).baseHref
      .map(b => UrlResolver.resolve(pageUrl, b)).getOrElse(pageUrl)
    val out = Vector.newBuilder[OutLink]
    var inertDepth = 0 // script/style/template nesting
    var href: String = null
    var nofollow = false
    val anchor = new StringBuilder
    def flush(): Unit = {
      if (href != null) {
        val h = href.trim
        val lower = h.toLowerCase(java.util.Locale.ROOT)
        val skip = h.isEmpty || h.startsWith("#") ||
          lower.startsWith("javascript:") || lower.startsWith("mailto:") ||
          lower.startsWith("data:") || lower.startsWith("tel:")
        if (!skip)
          out += OutLink(UrlResolver.resolve(base, h),
            anchor.toString.trim.replaceAll("\\s+", " "), nofollow)
      }
      href = null; nofollow = false; anchor.setLength(0)
    }
    HtmlTokenizer.tokenizeInto(html, new HtmlTokenizer.TokenSink {
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit =
        name match {
          case "script" | "style" | "template" if !selfClosing => inertDepth += 1
          case "a" if inertDepth == 0 =>
            flush() // an <a> inside an unclosed <a> implies-closes it (HTML)
            val m = attrs.toMap
            href = m.getOrElse("href", null)
            nofollow = m.getOrElse("rel", "").toLowerCase(java.util.Locale.ROOT)
              .split("[\\s,]+").contains("nofollow")
          case _ =>
        }
      def endTag(name: String): Unit = name match {
        case "script" | "style" | "template" => if (inertDepth > 0) inertDepth -= 1
        case "a" if inertDepth == 0 => flush()
        case _ =>
      }
      def text(t: String): Unit =
        if (inertDepth == 0 && href != null) anchor.append(t).append(' ')
    }, materializeAttrs = true)
    flush() // torn tail: an unclosed final <a> still reports its target
    out.result()
  }

  /** The target's host (lowercased, default-port-free) — the vertex key
    * of the host link graph.
    */
  def hostOf(absoluteUrl: String): String = {
    val lower = absoluteUrl.toLowerCase(java.util.Locale.ROOT)
    val i = lower.indexOf("://")
    if (i < 0) return ""
    val rest = lower.substring(i + 3)
    val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
      case -1 => rest.length
      case e  => e
    }
    val auth = rest.substring(0, end).split('@').last
    val colon = auth.indexOf(':')
    if (colon >= 0) auth.substring(0, colon) else auth
  }
}
