package graft.core.html

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** HTML5-style encoding sniffing, simplified and deterministic — real
  * Common-Crawl payloads are far from all-UTF-8, and "byte-identical
  * extracted text per url" requires decoding a windows-1252 page as
  * windows-1252, not as UTF-8-with-replacement-characters.
  *
  * Order (a fixed subset of the HTML5 algorithm):
  *   1. BOM: UTF-8 / UTF-16LE / UTF-16BE (BOM bytes stripped, as browsers do);
  *   2. meta prescan over the first 1024 bytes: a `charset=` inside a
  *      `<meta ...>` tag (both the `charset` attribute and the
  *      `http-equiv Content-Type; charset=` form parse, quoted or bare);
  *   3. fallback: UTF-8 with U+FFFD replacement — byte-identical to the
  *      round-1/2 policy, so every existing fixture is unaffected.
  *
  * Label table: the WHATWG encoding aliases for the charsets this JVM is
  * guaranteed to ship. Per HTML5, `iso-8859-1`/`ascii` map to
  * windows-1252, and a `utf-16` label found in a META tag is decoded as
  * UTF-8 (the prescan saw ASCII-compatible bytes, so the label lies).
  * Unknown labels fall through to UTF-8 rather than throwing.
  */
object CharsetSniffer {

  private val labels: Map[String, String] = Map(
    "utf-8" -> "UTF-8", "utf8" -> "UTF-8", "unicode-1-1-utf-8" -> "UTF-8",
    // HTML5: latin-1 family and ascii are windows-1252 in practice
    "iso-8859-1" -> "windows-1252", "iso8859-1" -> "windows-1252",
    "latin1" -> "windows-1252", "latin-1" -> "windows-1252",
    "us-ascii" -> "windows-1252", "ascii" -> "windows-1252",
    "windows-1252" -> "windows-1252", "cp1252" -> "windows-1252",
    "windows-1250" -> "windows-1250", "windows-1251" -> "windows-1251",
    "windows-1253" -> "windows-1253", "windows-1254" -> "windows-1254",
    "windows-1255" -> "windows-1255", "windows-1256" -> "windows-1256",
    "windows-1257" -> "windows-1257", "windows-1258" -> "windows-1258",
    "iso-8859-2" -> "ISO-8859-2", "iso-8859-5" -> "ISO-8859-5",
    "iso-8859-7" -> "ISO-8859-7", "iso-8859-9" -> "ISO-8859-9",
    "iso-8859-15" -> "ISO-8859-15",
    "koi8-r" -> "KOI8-R", "koi8-u" -> "KOI8-U",
    "shift_jis" -> "Shift_JIS", "shift-jis" -> "Shift_JIS", "sjis" -> "Shift_JIS",
    "euc-jp" -> "EUC-JP", "iso-2022-jp" -> "ISO-2022-JP",
    "gbk" -> "GBK", "gb2312" -> "GBK", "gb18030" -> "GB18030",
    "big5" -> "Big5", "euc-kr" -> "EUC-KR",
    // utf-16 label inside an ASCII-compatible meta tag is a lie → UTF-8
    "utf-16" -> "UTF-8", "utf-16le" -> "UTF-8", "utf-16be" -> "UTF-8")

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Find a `charset=<label>` inside a `<meta ...>` within the first 1 KB.
    * The tag-context check (nearest '<' before the match starts "<meta")
    * keeps body text containing the word "charset" from triggering.
    */
  private[core] def prescan(bytes: Array[Byte]): Option[String] = {
    val n = math.min(bytes.length, 1024)
    val raw = new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
      .toLowerCase(java.util.Locale.ROOT)
    // HTML5 prescan skips comment spans BEFORE looking for meta tags — a
    // commented-out `<!-- <meta charset=...> -->` must not override the
    // page's real encoding. Blank the spans (an unterminated comment runs
    // to the end of the window, as in the spec's bogus-comment handling).
    // The terminator scan starts at ci+2 so the spec's ABRUPT closes
    // `<!-->` and `<!--->` work: their `--` overlaps the opener, and
    // missing that would blank the rest of the window including any real
    // declaration after the comment.
    val s = {
      var ci = raw.indexOf("<!--")
      if (ci < 0) raw
      else {
        val sb = new StringBuilder(raw)
        while (ci >= 0) {
          val ce = raw.indexOf("-->", ci + 2)
          val end = if (ce < 0) raw.length else ce + 3
          var k = ci
          while (k < end) { sb.setCharAt(k, ' '); k += 1 }
          ci = raw.indexOf("<!--", end)
        }
        sb.toString
      }
    }
    var i = s.indexOf("charset")
    while (i >= 0) {
      val lt = s.lastIndexOf('<', i)
      val gt = if (lt < 0) -1 else s.indexOf('>', lt)
      val inMeta = lt >= 0 && s.startsWith("<meta", lt) && (gt < 0 || gt > i)
      if (inMeta) {
        var j = i + 7
        while (j < s.length && isWs(s.charAt(j))) j += 1
        if (j < s.length && s.charAt(j) == '=') {
          j += 1
          while (j < s.length && isWs(s.charAt(j))) j += 1
          if (j < s.length) {
            val c = s.charAt(j)
            val label =
              if (c == '"' || c == '\'') {
                val e = s.indexOf(c, j + 1)
                if (e > j) Some(s.substring(j + 1, e)) else None
              } else {
                var e = j
                while (e < s.length && !isWs(s.charAt(e)) &&
                  s.charAt(e) != ';' && s.charAt(e) != '>' &&
                  s.charAt(e) != '"' && s.charAt(e) != '\'') e += 1
                if (e > j) Some(s.substring(j, e)) else None
              }
            label.map(_.trim).filter(_.nonEmpty) match {
              case Some(l) => return Some(l)
              case None =>
            }
          }
        }
      }
      i = s.indexOf("charset", i + 7)
    }
    None
  }

  private def decodeWith(cs: Charset, bytes: Array[Byte], offset: Int): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, offset, bytes.length - offset)).toString
  }

  /** Decode page bytes with sniffed encoding (BOM → meta → UTF-8). */
  def decode(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) return ""
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return decodeWith(StandardCharsets.UTF_8, bytes, 3)
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return decodeWith(StandardCharsets.UTF_16LE, bytes, 2)
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return decodeWith(StandardCharsets.UTF_16BE, bytes, 2)
    prescan(bytes).flatMap(l => labels.get(l)) match {
      case Some(name) if Charset.isSupported(name) =>
        decodeWith(Charset.forName(name), bytes, 0)
      case _ => HtmlTokenizer.decodeUtf8(bytes)
    }
  }
}
