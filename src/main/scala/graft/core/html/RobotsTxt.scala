package graft.core.html

/** One robots.txt rule: an Allow/Disallow path pattern (may contain `*`
  * wildcards and a `$` end anchor, the RFC 9309 §2.2.3 extensions).
  */
final case class RobotRule(allow: Boolean, pattern: String)

/** Robots Exclusion Protocol (RFC 9309) — the consent check a crawl
  * pipeline runs before a URL ever reaches extraction (the page-level
  * `noindex` honored by the curated pipeline is the POST-fetch signal;
  * robots.txt is the pre-fetch one).
  *
  * Semantics implemented from the RFC:
  *   - groups of `User-agent:` lines share the rules that follow; the
  *     group matched is the LONGEST product-token match for our agent,
  *     falling back to the `*` group (§2.2.1)
  *   - `Allow:`/`Disallow:` values are path patterns; `*` matches any
  *     char run, `$` anchors the end (§2.2.3)
  *   - the decision is the MOST SPECIFIC (longest-pattern) matching rule;
  *     on a tie between allow and disallow, allow wins (§2.2.2)
  *   - no matching rule, no group, or an empty `Disallow:` → allowed
  *   - lines are `#`-comment-stripped; unknown directives are ignored
  *     (forward compatibility, §2.2.4); `Sitemap:` lines are surfaced
  *     separately
  */
object RobotsTxt {

  /** Rules governing `agent` (lowercased product-token match; the
    * longest-matching token level wins; `*` groups are the fallback).
    * RFC 9309 §2.2.1: when MORE THAN ONE group matches at that level —
    * the same agent named twice in the file is a common real-world
    * pattern — their rules MUST be combined, not first-group-wins.
    */
  def parse(txt: String, agent: String = "*"): Vector[RobotRule] =
    matchingGroups(txt, agent).flatMap(_.rules)

  private def matchingGroups(txt: String, agent: String): Vector[Group] = {
    val groups = parseGroups(txt)
    if (groups.isEmpty) return Vector.empty
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    def bestTokenLen(g: Group): Int =
      g.agents.iterator
        .filter(ua => ua != "*" && ua.nonEmpty && a.contains(ua))
        .map(_.length).foldLeft(0)(_ max _)
    val maxLen = groups.map(bestTokenLen).max
    if (maxLen > 0) groups.filter(bestTokenLen(_) == maxLen)
    else groups.filter(_.agents.contains("*"))
  }

  /** `Sitemap:` URLs anywhere in the file (they are group-independent). */
  def sitemaps(txt: String): Vector[String] =
    lines(txt).collect { case ("sitemap", v) if v.nonEmpty => v }

  /** `Crawl-delay:` seconds for `agent` — not in RFC 9309 but a de-facto
    * extension major crawlers honor (Bing/Yandex document it; Google
    * ignores it), and the input a politeness scheduler wants per host.
    * Group selection is identical to [[parse]]; when several matching
    * groups (or repeated directives inside one group) carry a delay, the
    * LARGEST wins — the conservative reading of conflicting politeness
    * asks. Invalid / negative values are ignored (forward compatibility,
    * like any unknown directive).
    */
  def crawlDelay(txt: String, agent: String = "*"): Option[Long] = {
    val ds = matchingGroups(txt, agent).flatMap(_.delays)
    if (ds.isEmpty) None else Some(ds.max)
  }

  /** RFC 9309 §2.2.2: longest matching pattern wins; allow wins ties;
    * nothing matches → allowed.
    */
  def isAllowed(rules: Seq[RobotRule], path: String): Boolean = {
    val p = if (path.isEmpty) "/" else path
    val matching = rules.filter(r => r.pattern.nonEmpty && matches(r.pattern, p))
    if (matching.isEmpty) true
    else {
      val maxLen = matching.map(_.pattern.length).max
      matching.filter(_.pattern.length == maxLen).exists(_.allow) // tie → allow
    }
  }

  /** Convenience: parse + decide in one call (the crawler's hot path
    * caches `parse` per host; this exists for column-level use).
    */
  def allowed(txt: String, path: String, agent: String = "*"): Boolean =
    isAllowed(parse(txt, agent), path)

  /** Pattern match with `*` (any run, including empty) and terminal `$`
    * (end anchor); patterns are implicitly prefix-anchored at the path
    * start. Linear-scan backtracking over segment positions — no regex
    * compilation per row.
    */
  def matches(pattern: String, path: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    val parts = splitKeepEmpty(pat, '*')
    // first part must match at position 0; middle parts float; last part
    // must reach the end iff anchored
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part, 0)) return false
        pos = part.length
      } else if (i == parts.length - 1 && anchored) {
        // last fragment must END the path
        return path.length - pos >= part.length && path.endsWith(part)
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    if (anchored) pos == path.length || parts.last.isEmpty
    else true
  }

  // ---------------------------------------------------------------- guts

  private final case class Group(
      agents: Vector[String], rules: Vector[RobotRule], delays: Vector[Long])

  private def lines(txt: String): Vector[(String, String)] =
    txt.split("\r?\n").toVector.flatMap { raw =>
      val noComment = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }
      val c = noComment.indexOf(':')
      if (c <= 0) None
      else {
        val k = noComment.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val v = noComment.substring(c + 1).trim
        Some((k, v))
      }
    }

  private def parseGroups(txt: String): Vector[Group] = {
    val out = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[RobotRule]
    var delays = Vector.empty[Long]
    var inRules = false // false while collecting consecutive User-agent lines
    def flush(): Unit = if (agents.nonEmpty) { out += Group(agents, rules, delays) }
    lines(txt).foreach {
      case ("user-agent", v) =>
        if (inRules) {
          flush(); agents = Vector.empty; rules = Vector.empty
          delays = Vector.empty; inRules = false
        }
        agents :+= v.toLowerCase(java.util.Locale.ROOT)
      case ("allow", v) if agents.nonEmpty =>
        inRules = true
        if (v.nonEmpty) rules :+= RobotRule(allow = true, v)
      case ("disallow", v) if agents.nonEmpty =>
        inRules = true // an empty Disallow still closes the agent list
        if (v.nonEmpty) rules :+= RobotRule(allow = false, v)
      case ("crawl-delay", v) if agents.nonEmpty =>
        // group-member directive: closes the agent list like allow/
        // disallow (the Protego/Scrapy reading — once the parser KNOWS
        // the directive, it belongs to the group above it; a parser that
        // ignores it would instead merge "User-agent: a\nCrawl-delay: 5\n
        // User-agent: b" into one group, which is the unknown-directive
        // RFC 9309 reading, deliberately not taken here)
        inRules = true
        parseDelay(v).foreach(delays :+= _)
      case _ => // unknown directive (sitemap, …): ignored here
    }
    flush()
    out.result()
  }

  /** Delay seconds, accepting the fractional form in the wild ("1.5" —
    * Yandex documents it) by rounding UP: the conservative direction for
    * a politeness ask. Invalid / negative / oversized values → None.
    */
  private def parseDelay(v: String): Option[Long] = {
    val dot = v.indexOf('.')
    val (ip, fp) = if (dot >= 0) (v.substring(0, dot), v.substring(dot + 1)) else (v, "")
    if (ip.isEmpty || ip.length > 9 || !ip.forall(_.isDigit)) None
    else if (dot >= 0 && (fp.isEmpty || !fp.forall(_.isDigit))) None
    else Some(ip.toLong + (if (fp.exists(_ != '0')) 1L else 0L))
  }

  private def splitKeepEmpty(s: String, sep: Char): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == sep) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.toArray
  }
}
