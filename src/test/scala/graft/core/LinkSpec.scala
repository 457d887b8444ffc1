package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.html.{LinkExtractor, OutLink}

class LinkSpec extends AnyFunSuite {

  private val page = "https://ex.com/dir/page.html"

  test("relative hrefs resolve against the page url; base href overrides") {
    val html = """<a href="/abs">A</a><a href="rel">B</a><a href="https://other.org/x">C</a>"""
    assert(LinkExtractor.extract(html, page).map(_.target) ==
      Vector("https://ex.com/abs", "https://ex.com/dir/rel", "https://other.org/x"))
    val based = """<head><base href="https://cdn.ex.com/root/"></head><a href="rel">B</a>"""
    assert(LinkExtractor.extract(based, page).map(_.target) ==
      Vector("https://cdn.ex.com/root/rel"))
  }

  test("anchor text flattens nested markup; nofollow is per-link") {
    val html =
      """<a href="/a" rel="nofollow noopener">click  <b>here</b> now</a>
        |<a href="/b">plain</a>""".stripMargin
    val links = LinkExtractor.extract(html, page)
    assert(links == Vector(
      OutLink("https://ex.com/a", "click here now", nofollow = true),
      OutLink("https://ex.com/b", "plain", nofollow = false)))
  }

  test("non-fetchable schemes, fragments, and inert content are dropped") {
    val html =
      """<a href="#top">skip</a><a href="javascript:void(0)">js</a>
        |<a href="mailto:x@y.z">mail</a><a href="tel:+1555">tel</a>
        |<script>var a = '<a href="/ghost">never</a>';</script>
        |<a href="/real">kept</a>""".stripMargin
    assert(LinkExtractor.extract(html, page).map(_.target) == Vector("https://ex.com/real"))
  }

  test("implied close (a inside a) and torn tail still report targets") {
    val html = """<a href="/one">first <a href="/two">second</a> tail"""
    assert(LinkExtractor.extract(html, page).map(_.target) ==
      Vector("https://ex.com/one", "https://ex.com/two"))
  }

  test("hostOf strips scheme, userinfo, port, path") {
    assert(LinkExtractor.hostOf("https://User@WWW.Ex.COM:8443/p?q#f") == "www.ex.com")
    assert(LinkExtractor.hostOf("http://h.io/x") == "h.io")
    assert(LinkExtractor.hostOf("relative/only") == "")
  }

  test("generated pages yield their nav and footer links") {
    // pick an HTML page (kinds 10-13 are PDF/empty/invalid-UTF-8 payloads)
    val seed = graft.pipeline.PageGen.DefaultSeed
    val i = (0L until 50L).find(graft.pipeline.PageGen.kind(seed, _) == 0).get
    val p = graft.pipeline.PageGen.page(seed, i)
    val links = LinkExtractor.extract(
      graft.core.html.CharsetSniffer.decode(p.html), p.url)
    assert(links.nonEmpty)
    // footer links are always present and resolve onto the page's host
    val host = LinkExtractor.hostOf(p.url)
    assert(links.map(_.target).exists(_.endsWith("/about")))
    assert(links.forall(l => LinkExtractor.hostOf(l.target) == host))
  }
}
