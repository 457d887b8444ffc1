package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.html.UrlResolver.resolve

class UrlResolverSpec extends AnyFunSuite {

  private val base = "http://a/b/c/d;p?q"

  test("RFC 3986 §5.4.1 normal examples (fragments dropped by design)") {
    val cases = Seq(
      "g"      -> "http://a/b/c/g",
      "./g"    -> "http://a/b/c/g",
      "g/"     -> "http://a/b/c/g/",
      "/g"     -> "http://a/g",
      "//g"    -> "http://g",
      "?y"     -> "http://a/b/c/d;p?y",
      "g?y"    -> "http://a/b/c/g?y",
      "#s"     -> "http://a/b/c/d;p?q", // canonical targets are documents, not anchors
      "g#s"    -> "http://a/b/c/g",
      ";x"     -> "http://a/b/c/;x",
      "g;x"    -> "http://a/b/c/g;x",
      ""       -> "http://a/b/c/d;p?q",
      "."      -> "http://a/b/c/",
      "./"     -> "http://a/b/c/",
      ".."     -> "http://a/b/",
      "../"    -> "http://a/b/",
      "../g"   -> "http://a/b/g",
      "../.."  -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    cases.foreach { case (ref, want) =>
      assert(resolve(base, ref) == want, s"ref '$ref'")
    }
  }

  test("RFC 3986 §5.4.2 abnormal examples") {
    val cases = Seq(
      "../../../g"    -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g"          -> "http://a/g",
      "/../g"         -> "http://a/g",
      "g."            -> "http://a/b/c/g.",
      ".g"            -> "http://a/b/c/.g",
      "g.."           -> "http://a/b/c/g..",
      "..g"           -> "http://a/b/c/..g",
      "./../g"        -> "http://a/b/g",
      "./g/."         -> "http://a/b/c/g/",
      "g/./h"         -> "http://a/b/c/g/h",
      "g/../h"        -> "http://a/b/c/h",
      "g;x=1/./y"     -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y"    -> "http://a/b/c/y")
    cases.foreach { case (ref, want) =>
      assert(resolve(base, ref) == want, s"ref '$ref'")
    }
  }

  test("absolute refs pass through; scheme and host lowercase; port kept") {
    assert(resolve(base, "HTTPS://Ex.COM:8443/Path?Q=1#frag") == "https://ex.com:8443/Path?Q=1")
    assert(resolve(base, "g:h") == "g:h") // scheme'd opaque ref is absolute per §4.2
    assert(resolve("http://a", "g") == "http://a/g") // empty base path
  }

  test("normalizeUrl: case, default ports, fragments, tracking params") {
    import graft.core.html.UrlResolver.normalizeUrl
    assert(normalizeUrl("HTTP://WWW.Ex.COM:80/Path?id=1#frag") == "http://www.ex.com/Path?id=1")
    assert(normalizeUrl("https://Ex.com:443/a") == "https://ex.com/a")
    assert(normalizeUrl("https://ex.com:8443/a") == "https://ex.com:8443/a") // non-default port kept
    assert(normalizeUrl("http://ex.com/p?utm_source=x&id=2&utm_medium=y") == "http://ex.com/p?id=2")
    assert(normalizeUrl("http://ex.com/p?utm_source=x") == "http://ex.com/p") // query empties
    assert(normalizeUrl("http://ex.com/p?fbclid=abc&gclid=def&q=1") == "http://ex.com/p?q=1")
    assert(normalizeUrl("http://ex.com/CaseSensitive/Path") == "http://ex.com/CaseSensitive/Path")
    assert(normalizeUrl("not a url") == "not a url") // non-absolute passes through
    assert(normalizeUrl(null) == "")
  }

  test("degenerate inputs produce empty, never throw") {
    assert(resolve("not a url", "/x") == "")
    assert(resolve(null, "/x") == "")
    assert(resolve("http://a/b", null) == "")
  }

  test("<base href> overrides the page URL as the canonical resolution base") {
    def page(url: String, head: String) = graft.pipeline.Page(
      url, java.sql.Timestamp.valueOf("2025-06-01 00:00:00"),
      (s"""<html><head>$head</head><body><p>enough words to extract text here</p></body></html>""").getBytes("UTF-8"),
      "", "en")
    // absolute base on a DIFFERENT host: the canonical belongs to cdn.example
    val a = graft.pipeline.ExtractStage.processOne(page(
      "https://site.com/dir/p.html",
      """<base href="https://cdn.example/assets/"><link rel=canonical href="x.html">"""))
    assert(a.canonical_url == "https://cdn.example/assets/x.html")
    // relative base resolves against the page first, then the canonical
    val b = graft.pipeline.ExtractStage.processOne(page(
      "https://site.com/dir/p.html",
      """<base href="../other/"><link rel=canonical href="x.html">"""))
    assert(b.canonical_url == "https://site.com/other/x.html")
    // only the FIRST base is effective (HTML spec)
    val c = graft.pipeline.ExtractStage.processOne(page(
      "https://site.com/dir/p.html",
      """<base href="/one/"><base href="/two/"><link rel=canonical href="x">"""))
    assert(c.canonical_url == "https://site.com/one/x")
  }

  test("extract stage stores RESOLVED canonicals: same path on two hosts must differ") {
    def page(url: String, href: String) = graft.pipeline.Page(
      url, java.sql.Timestamp.valueOf("2025-06-01 00:00:00"),
      (s"""<html><head><title>t</title><link rel="canonical" href="$href"></head>""" +
        "<body><p>enough words to extract something useful here</p></body></html>").getBytes("UTF-8"),
      "", "en")
    val a = graft.pipeline.ExtractStage.processOne(page("https://site-a.com/dir/p1.html", "/x"))
    val b = graft.pipeline.ExtractStage.processOne(page("https://site-b.com/dir/p2.html", "/x"))
    val c = graft.pipeline.ExtractStage.processOne(page("https://site-a.com/other.html", "https://site-a.com/x"))
    assert(a.canonical_url == "https://site-a.com/x")
    assert(b.canonical_url == "https://site-b.com/x")
    assert(a.canonical_url != b.canonical_url, "raw-href clustering would have collided these")
    assert(a.canonical_url == c.canonical_url, "relative and absolute declarations of the same target must agree")
  }
}
