package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.html.CharsetSniffer
import java.nio.charset.StandardCharsets

class CharsetSpec extends AnyFunSuite {

  private val prose = (1 to 20).map(i => s"word$i").mkString(" ")

  test("meta charset forms parse: bare, quoted, http-equiv") {
    def label(h: String) = CharsetSniffer.prescan(h.getBytes(StandardCharsets.ISO_8859_1))
    assert(label("""<html><head><meta charset=windows-1251></head>""") == Some("windows-1251"))
    assert(label("""<meta charset="Shift_JIS">""") == Some("shift_jis"))
    assert(label("""<meta charset='EUC-KR'>""") == Some("euc-kr"))
    assert(label("""<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-15">""")
      == Some("iso-8859-15"))
    assert(label("""<meta http-equiv=Content-Type content=text/html;charset=gbk>""")
      == Some("gbk"))
  }

  test("charset mentions outside a meta tag never trigger") {
    val inText = s"<html><body><p>the charset=utf-16 story $prose</p></body>"
    assert(CharsetSniffer.prescan(inText.getBytes(StandardCharsets.ISO_8859_1)).isEmpty)
    // and only within the first 1024 bytes
    val far = "<html><body>" + "x" * 1100 + "<meta charset=koi8-r>"
    assert(CharsetSniffer.prescan(far.getBytes(StandardCharsets.ISO_8859_1)).isEmpty)
  }

  test("windows-1252 page decodes its C1-range punctuation (not U+FFFD)") {
    val html = s"""<html><head><meta charset="iso-8859-1"></head><body><p>$prose café ’curly’ —dash</p></body></html>"""
    val bytes = html.getBytes("windows-1252")
    // sanity: 0x92 (’) is malformed UTF-8, the old policy produced U+FFFD
    assert(bytes.contains(0x92.toByte))
    val decoded = CharsetSniffer.decode(bytes)
    assert(decoded.contains("café") && decoded.contains("’curly’")
      && decoded.contains("—dash"))
    assert(!decoded.contains("�"))
    // end to end through the extract core
    val (text, _) = ExtractCore.extractText(bytes, "")
    assert(text.contains("café ’curly’ —dash"))
  }

  test("BOMs win over meta and are stripped from the text") {
    val utf8Bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      s"<body><p>$prose bomé</p></body>".getBytes(StandardCharsets.UTF_8)
    val d8 = CharsetSniffer.decode(utf8Bom)
    assert(d8.startsWith("<body>") && d8.contains("bomé"))
    val utf16 = ("﻿" + s"<body><p>$prose seizeé</p></body>")
      .getBytes(StandardCharsets.UTF_16LE)
    val d16 = CharsetSniffer.decode(utf16)
    assert(d16.startsWith("<body>") && d16.contains("seizeé"))
    val (text, _) = ExtractCore.extractText(utf16, "")
    assert(text.contains("seizeé"))
  }

  test("shift_jis page round-trips its Japanese text") {
    val jp = "日本語のテキスト"
    val html = s"""<html><head><meta charset=shift_jis></head><body><p>$prose $jp $prose</p></body>"""
    val (text, _) = ExtractCore.extractText(html.getBytes("Shift_JIS"), "")
    assert(text.contains(jp))
  }

  test("commented-out meta charset is skipped by the prescan (HTML5 comment rule)") {
    // the real declaration AFTER the comment must win
    val html = s"<!-- <meta charset=shift_jis> --><meta charset=windows-1252>" +
      s"<body><p>$prose café</p></body>"
    assert(CharsetSniffer.prescan(html.getBytes(StandardCharsets.ISO_8859_1))
      .contains("windows-1252"))
    // only a commented declaration → fall through to UTF-8 (no false match)
    val onlyComment = s"<!-- <meta charset=shift_jis> --><body><p>$prose xé</p></body>"
    assert(CharsetSniffer.prescan(onlyComment.getBytes(StandardCharsets.ISO_8859_1)).isEmpty)
    assert(CharsetSniffer.decode(onlyComment.getBytes(StandardCharsets.UTF_8)).contains("xé"))
    // unterminated comment blanks to the end of the 1 KB window
    val unterminated = s"<!-- <meta charset=shift_jis> <body><p>$prose</p></body>"
    assert(CharsetSniffer.prescan(unterminated.getBytes(StandardCharsets.ISO_8859_1)).isEmpty)
    // HTML5 abrupt closes: the terminator's `--` may OVERLAP the opener,
    // so `<!-->`/`<!--->` end immediately and the real meta stays live
    val abrupt = s"<!--><meta charset=windows-1252><body><p>$prose</p></body>"
    assert(CharsetSniffer.prescan(abrupt.getBytes(StandardCharsets.ISO_8859_1))
      .contains("windows-1252"))
    val abrupt3 = s"<!---><meta charset=shift_jis><body><p>$prose</p></body>"
    assert(CharsetSniffer.prescan(abrupt3.getBytes(StandardCharsets.ISO_8859_1))
      .contains("shift_jis"))
  }

  test("unknown or absent labels fall back to UTF-8 (fixture-identical policy)") {
    val noMeta = s"<body><p>$prose plainé</p></body>".getBytes(StandardCharsets.UTF_8)
    assert(CharsetSniffer.decode(noMeta).contains("plainé"))
    val unknown = s"<meta charset=klingon-1><body><p>$prose xé</p></body>"
      .getBytes(StandardCharsets.UTF_8)
    assert(CharsetSniffer.decode(unknown).contains("xé"))
    // invalid UTF-8 without a declared charset: the round-1 replacement policy
    val bad = Array[Byte]('a', 0x92.toByte, 'b')
    assert(CharsetSniffer.decode(bad) == "a�b")
  }
}
