package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.pdf.PdfTextExtractor
import graft.pipeline.PageGen

class PdfSpec extends AnyFunSuite {

  test("round-trip: uncompressed PDF reproduces text lines") {
    val text = "Line one\nLine two with (parens)\nLine three \\ backslash"
    val pdf = PageGen.pdfBytes(text, flate = false)
    assert(PdfTextExtractor.isPdf(pdf))
    assert(PdfTextExtractor.extract(pdf) == text)
  }

  test("round-trip: FlateDecode PDF reproduces text lines") {
    val text = "Invoice No. : 1234\nDate of Invoice : 12/06/2023\nFSSAI : 12345678901234"
    val pdf = PageGen.pdfBytes(text, flate = true)
    assert(PdfTextExtractor.extract(pdf) == text)
  }

  test("TJ arrays and Tm positioning") {
    val content =
      """BT
        |/F1 12 Tf
        |1 0 0 1 72 700 Tm
        |[(Hel) (lo) ( world)] TJ
        |1 0 0 1 72 650 Tm
        |(Second line) Tj
        |ET""".stripMargin.getBytes("ISO-8859-1")
    val got = PdfTextExtractor.extractFromContent(content)
    assert(got == "Hello world\nSecond line")
  }

  test("octal and special escapes in literal strings") {
    val content = "BT (A\\101\\x) Tj ET".getBytes("ISO-8859-1")
    val got = PdfTextExtractor.extractFromContent(content)
    assert(got == "AAx") // \101 = 'A'; \x → 'x' (unknown escape keeps char)
  }

  test("hex strings decode, with whitespace and odd-length zero-padding") {
    // <48 65 6C 6C 6F> = "Hello"; odd-length <48656C6C6F2> pads a trailing 0 → "Hello "
    val content = "BT <48 65 6C 6C 6F> Tj ET".getBytes("ISO-8859-1")
    assert(PdfTextExtractor.extractFromContent(content) == "Hello")
    val odd = "BT <48656C6C6F2> Tj ET".getBytes("ISO-8859-1")
    assert(PdfTextExtractor.extractFromContent(odd) == "Hello ")
  }

  test("nested balanced parens inside literal strings survive") {
    val content = "BT (outer (inner (deep)) tail) Tj ET".getBytes("ISO-8859-1")
    assert(PdfTextExtractor.extractFromContent(content) == "outer (inner (deep)) tail")
  }

  test("backslash-EOL is a line continuation: both omitted (PDF 7.3.4.2)") {
    val content = "BT (conti\\\nnued and conti\\\r\nnued again) Tj ET".getBytes("ISO-8859-1")
    assert(PdfTextExtractor.extractFromContent(content) == "continued and continued again")
  }

  test("non-PDF and garbage bytes return empty, never throw") {
    assert(PdfTextExtractor.extract("%PDF-1.4 garbage".getBytes) == "")
    assert(!PdfTextExtractor.isPdf("<html></html>".getBytes))
  }

  test("deterministic across calls") {
    val pdf = PageGen.pdfBytes(PageGen.mainContent(42L, 99L), flate = true)
    assert(PdfTextExtractor.extract(pdf) == PdfTextExtractor.extract(pdf))
  }
}
