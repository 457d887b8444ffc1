package graft.core.html

/** RFC 3986 §5 reference resolution, scoped to what a crawl pipeline needs
  * to make `<link rel=canonical href=…>` values comparable across pages:
  * a relative href is meaningful only against its page's URL. Clustering
  * on RAW href strings is wrong in both directions — `/x` on two different
  * hosts must not collide, and `/x` vs `https://host/x` on the same host
  * must. (The reference stores absolute result ids only, app.py; the web
  * makes us do the resolution ourselves.)
  *
  * Implements the §5.2.2 transform with §5.2.4 dot-segment removal.
  * Fragments are dropped (a canonical target is a document, not an
  * anchor). No scheme/host case normalization beyond what comparison
  * needs: scheme and host lowercase, path/query untouched.
  */
object UrlResolver {

  private final case class Parts(scheme: String, authority: String, path: String, query: String)

  /** Split an absolute URI into (scheme, authority, path, query); fragment
    * discarded. Returns null for inputs without a scheme.
    */
  private def parse(uri: String): Parts = {
    val noFrag = {
      val h = uri.indexOf('#')
      if (h >= 0) uri.substring(0, h) else uri
    }
    val cIdx = noFrag.indexOf(':')
    if (cIdx <= 0) return null
    val scheme = noFrag.substring(0, cIdx)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.') ||
        !scheme.head.isLetter) return null
    val rest = noFrag.substring(cIdx + 1)
    if (!rest.startsWith("//")) {
      // opaque (mailto:) — treat whole rest as path, no authority
      val q = rest.indexOf('?')
      return Parts(scheme.toLowerCase(java.util.Locale.ROOT), "",
        if (q >= 0) rest.substring(0, q) else rest,
        if (q >= 0) rest.substring(q + 1) else null)
    }
    val afterAuth = rest.substring(2)
    val pathStart = afterAuth.indexWhere(c => c == '/' || c == '?')
    val (auth, tail) =
      if (pathStart < 0) (afterAuth, "")
      else (afterAuth.substring(0, pathStart), afterAuth.substring(pathStart))
    val q = tail.indexOf('?')
    Parts(scheme.toLowerCase(java.util.Locale.ROOT),
      auth.toLowerCase(java.util.Locale.ROOT),
      if (q >= 0) tail.substring(0, q) else tail,
      if (q >= 0) tail.substring(q + 1) else null)
  }

  /** §5.2.4 remove_dot_segments. */
  private def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        // move the first segment (incl. leading '/') to output
        val start = if (in.startsWith("/")) 1 else 0
        val nextSlash = in.indexOf('/', start)
        if (nextSlash < 0) { out += in; in = "" }
        else { out += in.substring(0, nextSlash); in = in.substring(nextSlash) }
      }
    }
    out.mkString
  }

  /** §5.2.3 merge: resolve a relative path against the base. */
  private def merge(base: Parts, refPath: String): String =
    if (base.authority.nonEmpty && base.path.isEmpty) "/" + refPath
    else {
      val slash = base.path.lastIndexOf('/')
      if (slash < 0) refPath else base.path.substring(0, slash + 1) + refPath
    }

  /** Resolve `ref` against absolute `base`. Returns `ref` itself (fragment
    * stripped) when it is already absolute, and "" when nothing sensible
    * can be produced (unparseable base with a relative ref).
    */
  def resolve(base: String, ref: String): String = {
    if (ref == null) return ""
    val r = ref.trim
    val rNoFrag = { val h = r.indexOf('#'); if (h >= 0) r.substring(0, h) else r }
    val refAbs = parse(r)
    if (refAbs != null) return render(refAbs)
    val b = parse(if (base == null) "" else base.trim)
    if (b == null) return "" // relative ref, no usable base
    if (rNoFrag.isEmpty) return render(b) // self-reference
    if (rNoFrag.startsWith("//")) {
      // protocol-relative: keep base scheme
      val p = parse(b.scheme + ":" + rNoFrag)
      return if (p == null) "" else render(p)
    }
    val (rawPath, query) = {
      val q = rNoFrag.indexOf('?')
      if (q >= 0) (rNoFrag.substring(0, q), rNoFrag.substring(q + 1)) else (rNoFrag, null)
    }
    if (rawPath.isEmpty && query != null)
      return render(Parts(b.scheme, b.authority, b.path, query)) // "?q" form
    val mergedPath =
      if (rawPath.startsWith("/")) rawPath
      else merge(b, rawPath)
    render(Parts(b.scheme, b.authority, removeDotSegments(mergedPath), query))
  }

  /** URL normalization for URL-level dedup (the cheap first pass every
    * crawl pipeline runs before any content hashing):
    *   1. drop the fragment
    *   2. lowercase the scheme://authority prefix (path/query case is
    *      significant, host case is not)
    *   3. strip default ports (http:80, https:443)
    *   4. drop tracking query params (utm_*, fbclid, gclid), removing the
    *      '?' if the query empties
    * Deliberately algorithmic (split → filter → rejoin) rather than
    * regex-cleanup so the DuckDB oracle can mirror it step for step.
    */
  def normalizeUrl(u0: String): String = {
    if (u0 == null) return ""
    val noFrag = { val h = u0.indexOf('#'); if (h >= 0) u0.substring(0, h) else u0 }
    val preM = java.util.regex.Pattern
      .compile("^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)").matcher(noFrag)
    if (!preM.find()) return noFrag // not an absolute http-ish URL: leave as-is
    var prefix = preM.group(1).toLowerCase(java.util.Locale.ROOT)
    if (prefix.startsWith("http://") && prefix.endsWith(":80"))
      prefix = prefix.substring(0, prefix.length - 3)
    else if (prefix.startsWith("https://") && prefix.endsWith(":443"))
      prefix = prefix.substring(0, prefix.length - 4)
    val rest = noFrag.substring(preM.group(1).length)
    val q = rest.indexOf('?')
    val path = if (q >= 0) rest.substring(0, q) else rest
    val query = if (q >= 0) rest.substring(q + 1) else ""
    val kept = query.split("&", -1).filter(p =>
      p.nonEmpty && !p.startsWith("utm_") && !p.startsWith("fbclid=") && !p.startsWith("gclid="))
    prefix + path + (if (kept.isEmpty) "" else kept.mkString("?", "&", ""))
  }

  private def render(p: Parts): String = {
    val sb = new java.lang.StringBuilder(p.scheme).append(':')
    if (p.authority.nonEmpty || p.scheme == "http" || p.scheme == "https")
      sb.append("//").append(p.authority)
    sb.append(p.path)
    if (p.query != null) sb.append('?').append(p.query)
    sb.toString
  }
}
