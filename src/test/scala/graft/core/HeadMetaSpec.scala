package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.html.HeadMeta

class HeadMetaSpec extends AnyFunSuite {

  test("title, canonical, and robots directives parse from a normal head") {
    val h = HeadMeta.parse(
      """<html><head><title>  A   Spaced
        |Title </title>
        |<link rel="stylesheet" href="/s.css">
        |<link rel="canonical" href="https://example.com/real-page">
        |<meta name="robots" content="noindex, nofollow">
        |</head><body><p>content</p></body></html>""".stripMargin)
    assert(h.title == "A Spaced Title")
    assert(h.canonical.contains("https://example.com/real-page"))
    assert(h.noindex && h.nofollow)
  }

  test("rel token list and case-insensitivity; first canonical wins") {
    val h = HeadMeta.parse(
      """<head><LINK REL="alternate canonical" HREF="/a">
        |<link rel=canonical href=/b></head>""".stripMargin)
    assert(h.canonical.contains("/a"))
  }

  test("robots 'none' implies both; 'nofollow' alone leaves indexing on") {
    assert(HeadMeta.parse("""<head><meta name=robots content=none></head>""")
      == HeadMeta("", None, noindex = true, nofollow = true))
    val nf = HeadMeta.parse("""<head><meta name="ROBOTS" content="NOFOLLOW"></head>""")
    assert(!nf.noindex && nf.nofollow)
  }

  test("directives OUTSIDE the head are ignored (implied head close)") {
    // <div> implicitly closes the head: the later canonical/robots are body junk
    val h = HeadMeta.parse(
      """<html><head><title>t</title><div>flow content</div>
        |<link rel=canonical href=/late><meta name=robots content=noindex>""".stripMargin)
    assert(h.title == "t")
    assert(h.canonical.isEmpty && !h.noindex)
    // no <head> tag at all: leading metadata still counts (implied head)
    val implied = HeadMeta.parse(
      "<meta name=robots content=noindex><title>x</title><p>body</p>")
    assert(implied.noindex && implied.title == "x")
  }

  test("markup inside title raw text stays literal; empty/garbage is total") {
    assert(HeadMeta.parse("<head><title>a <b> c</title></head>").title == "a <b> c")
    assert(HeadMeta.parse("") == HeadMeta("", None, noindex = false, nofollow = false))
    assert(HeadMeta.parse("<<<>>>").canonical.isEmpty)
  }

  test("generated pages expose their titles (corpus smoke)") {
    val p = graft.pipeline.PageGen.page(42L, 3L)
    if (graft.pipeline.PageGen.kind(42L, 3L) == 0) {
      val h = HeadMeta.parse(new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
      assert(h.title.nonEmpty)
    }
  }
}
