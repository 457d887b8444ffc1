package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.html.{Sitemap, SitemapEntry, SitemapXml}

class SitemapSpec extends AnyFunSuite {

  test("urlset: loc/lastmod/priority per entry, namespaces and attrs ignored") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://ex.com/a</loc>
        |    <lastmod>2025-06-01</lastmod>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc>https://ex.com/b?x=1&amp;y=2</loc></url>
        |  <url><loc><![CDATA[https://ex.com/c?raw&weird]]></loc></url>
        |</urlset>
        |""".stripMargin
    val sm = SitemapXml.parse(xml)
    assert(sm.children.isEmpty)
    assert(sm.entries == Vector(
      SitemapEntry("https://ex.com/a", Some("2025-06-01"), Some(0.8)),
      SitemapEntry("https://ex.com/b?x=1&y=2", None, None),
      SitemapEntry("https://ex.com/c?raw&weird", None, None)))
  }

  test("sitemapindex: child sitemap locs, no leaf entries") {
    val xml =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://ex.com/sitemap-a.xml</loc><lastmod>2025-01-01</lastmod></sitemap>
        |  <sitemap><loc>https://ex.com/sitemap-b.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(SitemapXml.parse(xml) ==
      Sitemap(Vector.empty, Vector("https://ex.com/sitemap-a.xml", "https://ex.com/sitemap-b.xml")))
  }

  test("namespace-prefixed tags and junk tolerance") {
    val xml =
      """<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sm:url><sm:loc>https://ex.com/ns</sm:loc></sm:url>
        |</sm:urlset>""".stripMargin
    assert(SitemapXml.parse(xml).entries.map(_.loc) == Vector("https://ex.com/ns"))
    // torn tail: the last entry's close never arrives — keep the good ones
    val torn = "<urlset><url><loc>https://ex.com/ok</loc></url><url><loc>https://ex.com/torn"
    assert(SitemapXml.parse(torn).entries.map(_.loc) == Vector("https://ex.com/ok"))
    // a url with no loc contributes nothing
    assert(SitemapXml.parse("<urlset><url><lastmod>2025</lastmod></url></urlset>").entries.isEmpty)
    // non-numeric priority is dropped, loc survives
    val badPrio = "<urlset><url><loc>https://e.c/x</loc><priority>high</priority></url></urlset>"
    assert(SitemapXml.parse(badPrio).entries == Vector(SitemapEntry("https://e.c/x", None, None)))
  }

  test("entity decoding is single-pass (no double decode)") {
    assert(SitemapXml.unescape("a&amp;b") == "a&b")
    assert(SitemapXml.unescape("&amp;lt;") == "&lt;") // author wrote a literal "&lt;"
    assert(SitemapXml.unescape("&lt;x&gt;&quot;&apos;") == "<x>\"'")
  }
}
