package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.html.{RobotRule, RobotsTxt}

class RobotsSpec extends AnyFunSuite {

  test("RFC 9309 precedence: longest match wins, allow wins ties") {
    val txt =
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/ok/
        |""".stripMargin
    val rules = RobotsTxt.parse(txt)
    assert(rules == Vector(RobotRule(false, "/private/"), RobotRule(true, "/private/ok/")))
    assert(!RobotsTxt.isAllowed(rules, "/private/x"))
    assert(RobotsTxt.isAllowed(rules, "/private/ok/x")) // longer allow wins
    assert(RobotsTxt.isAllowed(rules, "/public/x"))     // nothing matches
    // exact tie between allow and disallow → allow
    val tie = Vector(RobotRule(false, "/p/"), RobotRule(true, "/p/"))
    assert(RobotsTxt.isAllowed(tie, "/p/x"))
  }

  test("empty Disallow allows everything; empty file allows everything") {
    assert(RobotsTxt.parse("User-agent: *\nDisallow:").isEmpty)
    assert(RobotsTxt.allowed("User-agent: *\nDisallow:", "/anything"))
    assert(RobotsTxt.allowed("", "/anything"))
  }

  test("group selection: specific agent beats *, other groups ignored") {
    val txt =
      """User-agent: otherbot
        |Disallow: /
        |
        |User-agent: graftbot
        |Disallow: /graft-only/
        |
        |User-agent: *
        |Disallow: /tmp/
        |""".stripMargin
    // our agent gets its own group, not otherbot's blanket ban
    assert(RobotsTxt.allowed(txt, "/tmp/x", agent = "graftbot")) // * group doesn't apply
    assert(!RobotsTxt.allowed(txt, "/graft-only/x", agent = "graftbot"))
    // unknown agent falls to the * group
    assert(!RobotsTxt.allowed(txt, "/tmp/x", agent = "somebot"))
    assert(RobotsTxt.allowed(txt, "/ok", agent = "somebot"))
    // consecutive User-agent lines share one rule set
    val shared = "User-agent: a\nUser-agent: b\nDisallow: /x/"
    assert(!RobotsTxt.allowed(shared, "/x/1", agent = "a"))
    assert(!RobotsTxt.allowed(shared, "/x/1", agent = "b"))
  }

  test("RFC 9309 §2.2.1: multiple groups matching the same agent COMBINE") {
    // the same agent named twice — both rule sets apply, not first-wins
    val twice =
      """User-agent: graftbot
        |Disallow: /a/
        |
        |User-agent: otherbot
        |Disallow: /
        |
        |User-agent: graftbot
        |Disallow: /b/
        |""".stripMargin
    assert(!RobotsTxt.allowed(twice, "/a/1", agent = "graftbot"))
    assert(!RobotsTxt.allowed(twice, "/b/1", agent = "graftbot"), "second group's rules must also apply")
    assert(RobotsTxt.allowed(twice, "/c/1", agent = "graftbot"))
    // two * groups combine for an unmatched agent the same way
    val starTwice = "User-agent: *\nDisallow: /a/\n\nUser-agent: *\nDisallow: /b/"
    assert(!RobotsTxt.allowed(starTwice, "/a/1", agent = "somebot"))
    assert(!RobotsTxt.allowed(starTwice, "/b/1", agent = "somebot"))
  }

  test("wildcard and end-anchor patterns (§2.2.3)") {
    assert(RobotsTxt.matches("/a/*/c", "/a/b/c"))
    assert(RobotsTxt.matches("/a/*/c", "/a/bbb/cxx")) // prefix semantics: match continues
    assert(!RobotsTxt.matches("/a/*/c", "/a/b/d"))
    assert(RobotsTxt.matches("/*.pdf$", "/docs/file.pdf"))
    assert(!RobotsTxt.matches("/*.pdf$", "/docs/file.pdfx"))
    assert(RobotsTxt.matches("/exact$", "/exact"))
    assert(!RobotsTxt.matches("/exact$", "/exact/more"))
    assert(RobotsTxt.matches("/p", "/page")) // plain prefix
    val rules = RobotsTxt.parse("User-agent: *\nDisallow: /*.json$\nDisallow: /search*q=")
    assert(!RobotsTxt.isAllowed(rules, "/api/data.json"))
    assert(RobotsTxt.isAllowed(rules, "/api/data.jsonl"))
    assert(!RobotsTxt.isAllowed(rules, "/search/results?q=x"))
  }

  test("comments, junk lines, and sitemaps") {
    val txt =
      """# a comment
        |User-agent: * # trailing comment
        |Disallow: /x/ # also stripped
        |not a directive
        |Crawl-delay: 10
        |Sitemap: https://ex.com/sitemap.xml
        |Sitemap: https://ex.com/sitemap2.xml
        |""".stripMargin
    assert(!RobotsTxt.allowed(txt, "/x/1"))
    assert(RobotsTxt.allowed(txt, "/y"))
    assert(RobotsTxt.sitemaps(txt) ==
      Vector("https://ex.com/sitemap.xml", "https://ex.com/sitemap2.xml"))
  }

  test("crawl-delay: group selection, largest-wins, invalid ignored, absent → None") {
    // plain delay in the * group
    assert(RobotsTxt.crawlDelay("User-agent: *\nCrawl-delay: 10\nDisallow:") == Some(10L))
    // the OTHER agent's delay must not leak into the * decision
    val multi = "User-agent: otherbot\nCrawl-delay: 99\n\nUser-agent: *\nCrawl-delay: 2\nDisallow: /tmp/"
    assert(RobotsTxt.crawlDelay(multi) == Some(2L))
    assert(RobotsTxt.crawlDelay(multi, agent = "otherbot") == Some(99L))
    // repeated directives: the largest (most polite) wins
    assert(RobotsTxt.crawlDelay("User-agent: *\nCrawl-delay: 3\nCrawl-delay: 7") == Some(7L))
    // invalid values are ignored like any unknown directive
    assert(RobotsTxt.crawlDelay("User-agent: *\nCrawl-delay: abc\nCrawl-delay: 5") == Some(5L))
    assert(RobotsTxt.crawlDelay("User-agent: *\nCrawl-delay: -1") == None)
    assert(RobotsTxt.crawlDelay("User-agent: *\nCrawl-delay: 9999999999999") == None)
    // fractional form (Yandex documents it) rounds UP — the conservative
    // direction for a politeness ask; a zero fraction is exact
    assert(RobotsTxt.crawlDelay("User-agent: *\nCrawl-delay: 1.5") == Some(2L))
    assert(RobotsTxt.crawlDelay("User-agent: *\nCrawl-delay: 2.0") == Some(2L))
    assert(RobotsTxt.crawlDelay("User-agent: *\nCrawl-delay: 0.2") == Some(1L))
    assert(RobotsTxt.crawlDelay("User-agent: *\nCrawl-delay: 1.") == None)
    assert(RobotsTxt.crawlDelay("User-agent: *\nCrawl-delay: .5") == None)
    // no delay, or delay outside any group → None
    assert(RobotsTxt.crawlDelay("User-agent: *\nDisallow:") == None)
    assert(RobotsTxt.crawlDelay("Crawl-delay: 8") == None)
    // a crawl-delay line CLOSES the agent list like allow/disallow does
    val closing = "User-agent: a\nCrawl-delay: 4\nUser-agent: b\nDisallow: /x"
    assert(RobotsTxt.crawlDelay(closing, agent = "a") == Some(4L))
    assert(RobotsTxt.crawlDelay(closing, agent = "b") == None)
    assert(RobotsTxt.parse(closing, agent = "b") == Vector(RobotRule(allow = false, "/x")))
    assert(RobotsTxt.parse(closing, agent = "a") == Vector.empty)
  }
}
