package graft.core.html

/** Head metadata a crawl pipeline acts on:
  *   - `title`        — first <title> text, whitespace-normalized
  *   - `canonical`    — first `<link rel=canonical href=…>` (the dedup
  *                      signal real web stacks consult before any content
  *                      hashing: pages sharing a canonical are declared
  *                      duplicates by the site itself)
  *   - `noindex` / `nofollow` — `<meta name=robots content=…>` directives
  *                      (training-data pipelines drop noindex pages: the
  *                      site owner asked not to be indexed)
  *
  * One streaming tokenizer pass, head-scoped with the SAME implied-close
  * rule as the block segmenter (head ends at the first non-metadata tag,
  * </head> optional per HTML5) so both consumers agree on what "in head"
  * means. Directives outside the head are ignored, as browsers do.
  */
final case class HeadMeta(
    title: String,
    canonical: Option[String],
    noindex: Boolean,
    nofollow: Boolean,
    /** First `<base href>` (HTML: only the first is effective) — overrides
      * the page URL as the base for resolving relative hrefs, including
      * the canonical link.
      */
    baseHref: Option[String] = None)

object HeadMeta {

  private val headMetadataTags = Set(
    "base", "basefont", "bgsound", "link", "meta", "title", "noscript",
    "noframes", "style", "script", "template", "head", "html")

  def parse(html: String): HeadMeta = {
    var inHead = true // implied <head>: metadata before any flow tag counts
    var inTitle = false
    val title = new StringBuilder
    var canonical: Option[String] = None
    var noindex = false
    var nofollow = false
    var baseHref: Option[String] = None

    HtmlTokenizer.tokenizeInto(html, new HtmlTokenizer.TokenSink {
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit = {
        if (inHead && !headMetadataTags.contains(name)) inHead = false
        if (inHead) name match {
          case "title" => inTitle = true
          case "base" =>
            if (baseHref.isEmpty)
              attrs.toMap.get("href").map(_.trim).filter(_.nonEmpty)
                .foreach(h => baseHref = Some(h))
          case "link" =>
            val m = attrs.toMap
            val rel = m.getOrElse("rel", "")
            if (canonical.isEmpty &&
                rel.trim.toLowerCase(java.util.Locale.ROOT)
                  .split("\\s+").contains("canonical"))
              m.get("href").map(_.trim).filter(_.nonEmpty)
                .foreach(h => canonical = Some(h))
          case "meta" =>
            val m = attrs.toMap
            if (m.getOrElse("name", "").trim
                .equalsIgnoreCase("robots")) {
              val directives = m.getOrElse("content", "")
                .toLowerCase(java.util.Locale.ROOT)
                .split("[,\\s]+").map(_.trim).toSet
              if (directives.contains("noindex") || directives.contains("none"))
                noindex = true
              if (directives.contains("nofollow") || directives.contains("none"))
                nofollow = true
            }
          case _ =>
        }
      }
      def endTag(name: String): Unit = {
        if (name == "title") inTitle = false
        if (name == "head") inHead = false
      }
      def text(t: String): Unit = if (inHead && inTitle) title.append(t)
    }, materializeAttrs = true)

    HeadMeta(
      title.toString.trim.replaceAll("\\s+", " "),
      canonical, noindex, nofollow, baseHref)
  }
}
