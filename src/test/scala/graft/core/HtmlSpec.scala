package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.html._

class HtmlSpec extends AnyFunSuite {

  test("tokenizer: tags, attributes, entities, comments, script raw text") {
    val html = """<html><head><script>if (a < b && c > d) {}</script></head>""" +
      """<body><!-- note --><p class="x" id=y>Tom &amp; Jerry &#65;&#x42;</p><br/><a href="/z">link</a></body></html>"""
    val toks = HtmlTokenizer.tokenize(html)
    val texts = toks.collect { case HtmlTokenizer.Text(t) => t }
    assert(texts.exists(_.contains("Tom & Jerry AB")))
    // script content captured as raw text (single Text token), not parsed as tags
    assert(texts.exists(_.contains("a < b")))
    val starts = toks.collect { case HtmlTokenizer.StartTag(n, a, _) => (n, a) }
    assert(starts.exists { case (n, a) => n == "p" && a.contains("class" -> "x") && a.contains("id" -> "y") })
    assert(!starts.exists(_._1 == "--")) // comment not tokenized as tag
  }

  test("tokenizer: malformed markup does not throw and keeps text") {
    val html = "<div><p>unclosed text 1 < 2 <b>bold</div>"
    val toks = HtmlTokenizer.tokenize(html)
    val text = toks.collect { case HtmlTokenizer.Text(t) => t }.mkString(" ")
    assert(text.contains("unclosed text 1 < 2"))
  }

  test("utf8 decode replaces invalid sequences with U+FFFD") {
    val bytes = "ok ".getBytes("UTF-8") ++ Array(0xC3.toByte, 0x28.toByte) ++ " end".getBytes("UTF-8")
    val s = HtmlTokenizer.decodeUtf8(bytes)
    assert(s.contains("ok "))
    assert(s.contains('�'))
    assert(s.endsWith(" end"))
  }

  test("block segmenter computes words and link density") {
    val html = "<body><nav><a href='/'>one two three</a></nav>" +
      "<p>" + Seq.fill(30)("word").mkString(" ") + "</p></body>"
    val blocks = BlockSegmenter.segment(html)
    val nav = blocks.find(_.linkWords > 0).get
    assert(nav.linkDensity == 1.0)
    val para = blocks.find(_.words == 30).get
    assert(para.linkDensity == 0.0)
  }

  test("boilerplate: long prose kept, link lists dropped") {
    val prose = Seq.fill(45)("content").mkString(" ")
    val html = s"<body><nav><a href='/a'>home</a> <a href='/b'>about</a> <a href='/c'>news</a></nav>" +
      s"<p>$prose</p>" +
      "<footer><a href='/t'>terms</a> <a href='/p'>privacy</a></footer></body>"
    val ex = Boilerplate.extract(html)
    assert(ex.text.contains("content"))
    assert(!ex.text.contains("terms"))
    assert(!ex.text.contains("home"))
    // spans cover exactly the text
    ex.spans.foreach { s =>
      assert(s.start >= 0 && s.end <= ex.text.length && s.start <= s.end)
    }
  }

  test("spans are non-overlapping, ordered, and slice to block text") {
    val html = graft.pipeline.PageGen.htmlPage(42L, 7L)
    val ex = Boilerplate.extract(html)
    ex.spans.sliding(2).foreach {
      case Vector(a, b) => assert(a.end <= b.start)
      case _ =>
    }
    ex.spans.foreach { s =>
      assert(ex.text.substring(s.start, s.end).nonEmpty)
    }
  }

  test("extraction is deterministic") {
    val html = graft.pipeline.PageGen.htmlPage(42L, 123L)
    val a = Boilerplate.extract(html)
    val b = Boilerplate.extract(html)
    assert(a.text == b.text)
    assert(a.spans == b.spans)
  }
}
