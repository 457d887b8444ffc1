package graft.core.html

/** One `<url>` entry of a urlset sitemap. */
final case class SitemapEntry(
    loc: String,
    lastmod: Option[String],
    priority: Option[Double])

/** Parsed sitemap: leaf entries and/or child sitemap locations (a
  * `<sitemapindex>` nests; a crawler walks the tree).
  */
final case class Sitemap(entries: Vector[SitemapEntry], children: Vector[String])

/** Sitemap-protocol parser (sitemaps.org, the format robots.txt
  * `Sitemap:` lines point at) — the crawl-discovery complement to
  * [[RobotsTxt]]: robots says what MAY be fetched, sitemaps say what the
  * site WANTS fetched, the frontier seen-set (SeenUrls) says what already
  * was.
  *
  * Deliberately a tolerant tag scanner, not a conforming XML parser: real
  * sitemaps carry junk (stray ampersands, truncated tails, namespace
  * variation), and a 50 MB sitemap must parse in one linear pass without
  * DOM allocation. Handles `<urlset>` and `<sitemapindex>` (tags matched
  * namespace-insensitively), `<loc>`/`<lastmod>`/`<priority>` children,
  * CDATA sections, and the five XML entities in loc text.
  */
object SitemapXml {

  def parse(xml: String): Sitemap = {
    val entries = Vector.newBuilder[SitemapEntry]
    val children = Vector.newBuilder[String]
    var i = 0
    val n = xml.length
    // per-record state, flushed at </url> / </sitemap>
    var inUrl = false
    var inChild = false
    var loc: String = null
    var lastmod: String = null
    var priority: String = null
    def flush(): Unit = {
      if (loc != null && loc.nonEmpty) {
        if (inChild) children += loc
        else entries += SitemapEntry(loc, Option(lastmod),
          Option(priority).flatMap(_.toDoubleOption))
      }
      loc = null; lastmod = null; priority = null
    }
    while (i < n) {
      val open = xml.indexOf('<', i)
      if (open < 0) i = n
      else {
        val close = xml.indexOf('>', open + 1)
        if (close < 0) i = n
        else {
          val rawTag = xml.substring(open + 1, close).trim
          val tag = localName(rawTag)
          tag match {
            case "url" => inUrl = true; inChild = false; loc = null; lastmod = null; priority = null
            case "sitemap" => inUrl = false; inChild = true; loc = null; lastmod = null; priority = null
            case "/url" | "/sitemap" => flush(); inUrl = false; inChild = false
            case "loc" | "lastmod" | "priority" if inUrl || inChild =>
              val (text, after) = readText(xml, close + 1)
              tag match {
                case "loc" => loc = text
                case "lastmod" => lastmod = text
                case "priority" => priority = text
              }
              i = after
            case _ => // xml decl, urlset/sitemapindex open/close, unknown tags
          }
          if (i <= close) i = close + 1
        }
      }
    }
    Sitemap(entries.result(), children.result())
  }

  /** Leaf-element text: runs to the next `<` (loc/lastmod/priority have
    * no children, so that IS the closing tag, whatever namespace prefix
    * it carries), CDATA taken literally (no entity decoding inside — that
    * is CDATA's point), plain text entity-decoded; returns
    * (text, index-after-close). A missing close ends at EOF — torn-tail
    * tolerance (the unterminated record never flushes).
    */
  private def readText(xml: String, from: Int): (String, Int) = {
    var start = from
    while (start < xml.length && xml.charAt(start).isWhitespace) start += 1
    if (xml.startsWith("<![CDATA[", start)) {
      val cstart = start + 9
      var cend = xml.indexOf("]]>", cstart)
      if (cend < 0) cend = xml.length
      val text = xml.substring(cstart, cend)
      val lt = xml.indexOf('<', math.min(xml.length, cend + 3))
      val gt = if (lt < 0) -1 else xml.indexOf('>', lt)
      (text, if (gt < 0) xml.length else gt + 1)
    } else {
      var end = xml.indexOf('<', start)
      if (end < 0) end = xml.length
      val text = xml.substring(start, end).trim
      val gt = if (end >= xml.length) -1 else xml.indexOf('>', end)
      (unescape(text), if (gt < 0) xml.length else gt + 1)
    }
  }

  private def localName(rawTag: String): String = {
    // strip attributes, then any namespace prefix; keep a leading '/'
    val head = rawTag.takeWhile(c => !c.isWhitespace)
    val slash = if (head.startsWith("/")) "/" else ""
    val bare = if (slash == "/") head.substring(1) else head
    val colon = bare.indexOf(':')
    slash + (if (colon >= 0) bare.substring(colon + 1) else bare)
      .toLowerCase(java.util.Locale.ROOT)
  }

  private[core] def unescape(s: String): String =
    if (s.indexOf('&') < 0) s
    // &amp; decoded LAST: doing it first would let "&amp;lt;" double-decode
    // into "<" instead of the literal "&lt;" the author wrote
    else s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&amp;", "&")
}
