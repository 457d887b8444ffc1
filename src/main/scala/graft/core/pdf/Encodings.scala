package graft.core.pdf

import java.util.regex.Pattern

/** Simple-font /Encoding handling (PDF 32000-1 §9.6.6): a font without a
  * /ToUnicode CMap may still remap codes through `/Differences [code
  * /name /name …]`, where each glyph NAME resolves to Unicode via the
  * Adobe Glyph List conventions. Older generators (TeX drivers, early
  * office exporters) ship exactly this shape, so without it their text
  * reads as the wrong characters. ToUnicode always wins when both exist;
  * codes outside the Differences ride the identity fallback (fine for
  * the ASCII/Latin-1 range the base encodings share).
  */
object Encodings {

  /** AGL-convention glyph name → Unicode string. Covers the systematic
    * forms (`uniXXXX`, `uXXXX[XX]`) plus the ASCII/punctuation names any
    * Differences array in the wild leans on; unknown names map to "".
    */
  def glyphToUnicode(name: String): String = {
    val n = name.stripPrefix("/")
    if (n.isEmpty) return ""
    // systematic forms first: uni20B9, u1D11E
    if (n.startsWith("uni") && n.length >= 7 &&
        n.substring(3).forall(c => Character.digit(c, 16) >= 0)) {
      // uniXXXX[XXXX…]: each 4-hex group is a UTF-16 code unit
      val hex = n.substring(3)
      if (hex.length % 4 == 0) {
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < hex.length) { sb.append(Integer.parseInt(hex.substring(i, i + 4), 16).toChar); i += 4 }
        return sb.toString
      }
    }
    if (n.startsWith("u") && n.length >= 5 && n.length <= 7 &&
        n.substring(1).forall(c => Character.digit(c, 16) >= 0))
      return new String(Character.toChars(Integer.parseInt(n.substring(1), 16)))
    if (n.length == 1) return n // /A /a /0 — name IS the character
    named.getOrElse(n, "")
  }

  private val named: Map[String, String] = Map(
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
    "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
    "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
    "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
    "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
    "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
    "greater" -> ">", "question" -> "?", "at" -> "@",
    "bracketleft" -> "[", "backslash" -> "\\", "bracketright" -> "]",
    "asciicircum" -> "^", "underscore" -> "_", "grave" -> "`",
    "braceleft" -> "{", "bar" -> "|", "braceright" -> "}", "asciitilde" -> "~",
    "quoteleft" -> "‘", "quoteright" -> "’",
    "quotedblleft" -> "“", "quotedblright" -> "”",
    "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
    "ellipsis" -> "…", "degree" -> "°", "copyright" -> "©",
    "registered" -> "®", "trademark" -> "™", "euro" -> "€",
    "sterling" -> "£", "yen" -> "¥", "cent" -> "¢",
    "section" -> "§", "paragraph" -> "¶", "dagger" -> "†",
    "daggerdbl" -> "‡", "perthousand" -> "‰",
    "guillemotleft" -> "«", "guillemotright" -> "»",
    "fi" -> "ﬁ", "fl" -> "ﬂ",
    "adieresis" -> "ä", "odieresis" -> "ö", "udieresis" -> "ü",
    "Adieresis" -> "Ä", "Odieresis" -> "Ö", "Udieresis" -> "Ü",
    "germandbls" -> "ß", "eacute" -> "é", "egrave" -> "è",
    "agrave" -> "à", "ccedilla" -> "ç", "ntilde" -> "ñ")

  private val DiffArray = Pattern.compile("/Differences\\s*\\[([^\\]]*)\\]", Pattern.DOTALL)
  private val DiffToken = Pattern.compile("(\\d+)|/([^\\s/\\[\\]<>()]+)")

  /** Parse a `/Differences` array out of an /Encoding dict's text into a
    * 1-byte ToUnicodeCMap-shaped mapper, or null when absent/empty.
    * Semantics: a number sets the next code; each following name maps
    * code++ (§9.6.6.1).
    */
  def differencesCMap(encodingDictText: String): ToUnicodeCMap = {
    val m = DiffArray.matcher(encodingDictText)
    if (!m.find()) return null
    val map = scala.collection.mutable.HashMap.empty[Int, String]
    val t = DiffToken.matcher(m.group(1))
    var code = -1
    while (t.find()) {
      if (t.group(1) != null) code = t.group(1).toInt
      else if (code >= 0 && code <= 0xFF) {
        val u = glyphToUnicode(t.group(2))
        if (u.nonEmpty) map(code) = u
        code += 1
      }
    }
    if (map.isEmpty) null else new ToUnicodeCMap(1, map.toMap)
  }
}
