package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.html.{Boilerplate, BlockSegmenter, HtmlTokenizer}

/** Adversarial real-world HTML shapes: the tokenizer/segmenter must stay
  * total, keep content, and never corrupt offsets.
  */
class HtmlEdgeSpec extends AnyFunSuite {

  private def extractText(html: String): String = Boilerplate.extract(html).text

  test("inline formatting does not split blocks") {
    val prose = Seq.fill(20)("word").mkString(" ")
    val html = s"<body><p>$prose <b>bold</b> <i>ital</i> <em>em</em> <strong>str</strong> <span>span</span> $prose</p></body>"
    val blocks = BlockSegmenter.segment(html)
    val para = blocks.find(_.words > 30).get
    assert(para.text.contains("bold ital em str span"))
  }

  test("nested tables keep cell text in separate blocks") {
    val html = "<table><tr><td>outer A</td><td><table><tr><td>inner B</td></tr></table></td></tr>" +
      "<tr><td>outer C</td></tr></table>"
    val blocks = BlockSegmenter.segment(html)
    val texts = blocks.map(_.text)
    assert(texts.contains("outer A"))
    assert(texts.contains("inner B"))
    assert(texts.contains("outer C"))
  }

  test("attributes with >, unquoted values, and duplicate names parse") {
    val html = """<body><p title="a > b" data-x=raw id=z id=zz>text here stays</p></body>"""
    val toks = HtmlTokenizer.tokenize(html)
    val p = toks.collectFirst { case HtmlTokenizer.StartTag("p", a, _) => a }.get
    assert(p.contains("title" -> "a > b"))
    assert(p.contains("data-x" -> "raw"))
    assert(toks.exists { case HtmlTokenizer.Text(t) => t.contains("text here stays"); case _ => false })
  }

  test("nbsp and numeric entities become text without breaking word counts") {
    val html = "<body><p>alpha&nbsp;beta&#32;gamma&#x20;delta</p></body>"
    val blocks = BlockSegmenter.segment(html)
    assert(blocks.head.text == "alpha beta gamma delta")
    assert(blocks.head.words == 4)
  }

  test("unterminated script consumes to EOF without exception") {
    val html = "<body><p>visible</p><script>var x = '<p>not content</p>';"
    val text = extractText(html + Seq.fill(30)(" pad").mkString)
    assert(!text.contains("not content"))
  }

  test("conditional comments and doctype junk are skipped") {
    val html = "<!DOCTYPE html><!--[if IE]><p>ie only</p><![endif]--><body><p>" +
      Seq.fill(20)("real").mkString(" ") + "</p></body>"
    val text = extractText(html)
    assert(!text.contains("ie only"))
    assert(text.contains("real real"))
  }

  test("deeply nested divs do not overflow (10k depth)") {
    val html = "<div>" * 10000 + "<p>deep content here with several words to keep</p>" + "</div>" * 10000
    val blocks = BlockSegmenter.segment(html)
    assert(blocks.exists(_.text.contains("deep content")))
  }

  test("angle brackets in text survive as literals") {
    val html = "<body><p>math: 1 < 2 and 3 > 2 and a<b when unspaced stays</p></body>"
    val text = BlockSegmenter.segment(html).map(_.text).mkString(" ")
    assert(text.contains("1 < 2"))
    assert(text.contains("3 > 2"))
    // "a<b" — the "<b" parses as a tag open (browser behavior); "a" survives
    assert(text.contains("a"))
  }

  test("mixed-case and namespaced tags normalize") {
    val html = "<BODY><P>upper tags</P><svg:rect/><DIV>more text</DIV></BODY>"
    val texts = BlockSegmenter.segment(html).map(_.text)
    assert(texts.contains("upper tags"))
    assert(texts.contains("more text"))
  }

  test("empty document and whitespace-only documents extract empty") {
    assert(extractText("") == "")
    assert(extractText("   \n\t  ") == "")
    assert(extractText("<html><head></head><body></body></html>") == "")
  }

  test("definition lists and blockquotes are blocks") {
    val html = "<dl><dt>Term</dt><dd>Definition text</dd></dl><blockquote>quoted words here</blockquote>"
    val texts = BlockSegmenter.segment(html).map(_.text)
    assert(texts.contains("Term"))
    assert(texts.contains("Definition text"))
    assert(texts.contains("quoted words here"))
  }

  test("'</>'-style junk never duplicates preceding text (regression)") {
    val toks = HtmlTokenizer.tokenize("Hello</>World")
    val texts = toks.collect { case HtmlTokenizer.Text(t) => t }
    assert(texts.mkString == "Hello</>World")
    // segmenter joins adjacent text runs with a space — the invariant is
    // no duplication, not byte-level concatenation
    val blocks = BlockSegmenter.segment("<p>Hello</>World</p>")
    assert(blocks.map(_.text).mkString(" ") == "Hello </>World")
  }

  test("'</scripty>' does not close a script element early (regression)") {
    val html = """<body><script>var s="</scripty>";</script><p>visible words</p></body>"""
    val text = extractText(html + Seq.fill(10)(" pad").mkString)
    assert(!text.contains("scripty"))
    assert(!text.contains("var s"))
  }

  test("'</hr>' does not clear heading state (regression)") {
    val blocks = BlockSegmenter.segment("<h2>alpha<hr></hr>beta words here</h2>")
    val beta = blocks.find(_.text.contains("beta")).get
    assert(beta.headingDepth == 2)
  }

  test("page without </head> still yields its body text (implicit head close)") {
    // HTML5 makes </head> optional: browsers pop head at the first
    // non-metadata tag. Without the implicit close the whole document
    // would be dropped as head content.
    val prose = Seq.fill(25)("content").mkString(" ")
    val noClose = s"<html><head><title>t</title><meta charset=utf-8><body><p>$prose</p></body></html>"
    assert(extractText(noClose).contains("content content"))
    assert(!extractText(noClose).contains("t t")) // title stays ignored
    // no <body> either — first flow tag pops head
    val bare = s"<html><head><title>t</title><div><p>$prose</p></div>"
    assert(extractText(bare).contains("content content"))
    // a stray </head> arriving INSIDE an open noscript (head already
    // implicitly closed) must not eat the noscript's ignore depth
    val stray = s"<head><meta><p>$prose</p><noscript>junk</head>more junk</noscript><p>$prose</p>"
    assert(!extractText(stray).contains("junk"))
  }

  test("CDATA outside foreign content is a bogus comment (consume to first '>')") {
    // browsers treat <![CDATA[ in HTML as a bogus comment ending at the
    // first '>' — the tail after that '>' is literal text
    val toks = HtmlTokenizer.tokenize("<p>a <![CDATA[hidden > rest]]> b</p>")
    val text = toks.collect { case HtmlTokenizer.Text(t) => t }.mkString
    assert(!text.contains("hidden"))
    assert(text.contains("rest]]> b"))
  }

  test("unterminated comment consumes to EOF without duplicating text") {
    val blocks = BlockSegmenter.segment("<p>keep these words</p><!-- lost to the void")
    assert(blocks.map(_.text).mkString(" ") == "keep these words")
  }

  test("textarea is raw text: markup inside is literal content, one block") {
    val toks = HtmlTokenizer.tokenize("<textarea><p>not a tag</p></textarea>")
    val text = toks.collect { case HtmlTokenizer.Text(t) => t }.mkString
    assert(text == "<p>not a tag</p>")
    assert(!toks.exists { case HtmlTokenizer.StartTag("p", _, _) => true; case _ => false })
  }

  test("template contents are inert (HTML5): never extracted as page text") {
    val prose = (1 to 40).map(k => s"realword$k").mkString(" ")
    val html = s"<body><p>$prose</p><template><p>ghost template words</p><div>more ghost</div></template><p>$prose</p></body>"
    val text = graft.core.html.Boilerplate.extract(html).text
    assert(text.contains("realword1"))
    assert(!text.contains("ghost"))
  }

  test("svg figure content (incl. <text> labels) stays out of extracted text") {
    val prose = (1 to 40).map(k => s"bodyword$k").mkString(" ")
    val html = s"<body><p>$prose</p><svg viewBox='0 0 10 10'><text x='1' y='1'>axis label</text><title>chart</title></svg><p>$prose</p></body>"
    val text = graft.core.html.Boilerplate.extract(html).text
    assert(text.contains("bodyword1"))
    assert(!text.contains("axis label") && !text.contains("chart"))
  }

  test("nav link-soup is boilerplate; surrounded content survives (link-density rule)") {
    // >40 words: the published rules demand MORE words of a block that
    // follows a link-dense neighbor (nav) before calling it content
    val prose = Seq.fill(45)("paragraph").mkString(" ")
    val nav = (1 to 8).map(k => s"""<a href="/s$k">Section $k</a>""").mkString(" ")
    val html = s"<body><nav>$nav</nav><p>$prose</p><footer>$nav</footer></body>"
    val text = extractText(html)
    assert(text.contains("paragraph paragraph"))
    assert(!text.contains("Section 1"), "pure-link nav must classify as boilerplate")
    assert(!text.contains("Section 8"), "pure-link footer must classify as boilerplate")
  }

  test("abruptly-closed comments <!--> and <!---> are complete (HTML5)") {
    val prose = Seq.fill(20)("kept").mkString(" ")
    // a naive indexOf("-->", i+4) scanner would eat the paragraph after <!-->
    assert(extractText(s"<body><!--><p>$prose</p></body>").contains("kept kept"))
    assert(extractText(s"<body><!---><p>$prose</p></body>").contains("kept kept"))
    // 4-dash <!----> is an ordinary empty comment
    assert(extractText(s"<body><!----><p>$prose</p></body>").contains("kept kept"))
  }

  test("--!> closes a comment (incorrectly-closed-comment recovery)") {
    val prose = Seq.fill(20)("kept").mkString(" ")
    val text = extractText(s"<body><!-- hidden words --!><p>$prose</p></body>")
    assert(!text.contains("hidden"))
    assert(text.contains("kept kept"))
  }

  test("comments hide markup: '--' runs and tags inside never tokenize") {
    val prose = Seq.fill(20)("real").mkString(" ")
    val html = s"<body><!-- a -- b <script>x</script> <p>ghost</p> --><p>$prose</p></body>"
    val text = extractText(html)
    assert(!text.contains("ghost") && !text.contains("x"))
    assert(text.contains("real real"))
  }

  test("entity edges: NUL/surrogate/out-of-range numeric refs become U+FFFD, junk stays literal") {
    import HtmlTokenizer.decodeEntities
    assert(decodeEntities("a&#0;b") == "a�b")
    assert(decodeEntities("a&#xD800;b") == "a�b") // unpaired surrogate
    assert(decodeEntities("a&#x110000;b") == "a�b") // > U+10FFFF
    assert(decodeEntities("a&#999999999999;b") == "a�b") // long overflow path
    assert(decodeEntities("a&#x1F600;b") == "a😀b") // astral plane round-trips
    assert(decodeEntities("&bogusname;") == "&bogusname;") // unknown named ref
    assert(decodeEntities("&amp") == "&amp") // missing semicolon: literal
    assert(decodeEntities("fish & chips") == "fish & chips") // bare ampersand
    assert(decodeEntities("&amp;lt;") == "&lt;") // ONE decode pass, never two
    assert(decodeEntities("&#x;") == "&#x;") // empty digits: literal
  }

  test("truncated documents: every byte prefix extracts without exception") {
    // a real fixture page truncated at every offset — mid-tag, mid-attr,
    // mid-entity, mid-comment, mid-script, mid-table-IR cuts all included
    val p = graft.pipeline.PageGen.page(GoldenFixtures.seed, 0L)
    val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
    var off = 1
    while (off < html.length) {
      val prefix = html.substring(0, off)
      val r = Boilerplate.extract(prefix) // must be total
      assert(r.text != null)
      off += (if (off < 2048) 1 else 17)
    }
    // and targeted cuts on a hand-built page
    val doc = """<html><head><title>t</title></head><body><p class="x y" data-k="v">words here and more words</p><table><tr><td>a</td></tr></table></body></html>"""
    (1 until doc.length).foreach { k =>
      Boilerplate.extract(doc.substring(0, k))
    }
  }

  test("truncated mid-entity / mid-attribute keeps preceding text intact") {
    val prose = Seq.fill(20)("solid").mkString(" ")
    val cutEntity = s"<body><p>$prose &am"
    assert(extractText(cutEntity).contains("solid solid"))
    val cutAttr = s"""<body><p>$prose</p><div class="unclo"""
    assert(extractText(cutAttr).contains("solid solid"))
    val cutTag = s"<body><p>$prose</p><di"
    assert(extractText(cutTag).contains("solid solid"))
  }

  test("html inside noscript is ignored") {
    val prose = Seq.fill(25)("keep").mkString(" ")
    val html = s"<body><noscript><p>fallback junk</p></noscript><p>$prose</p></body>"
    val text = extractText(html)
    assert(!text.contains("fallback junk"))
    assert(text.contains("keep keep"))
  }
}
