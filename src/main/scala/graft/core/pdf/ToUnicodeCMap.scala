package graft.core.pdf

import java.util.regex.Pattern

/** A parsed /ToUnicode CMap (PDF 32000-1 §9.10.3): glyph code → Unicode
  * string. This is what makes subset-font PDFs readable — their glyph
  * codes are arbitrary (code 1 might be "T"), and the only public mapping
  * back to text is this embedded CMap. The reference reads such PDFs via
  * pdfplumber (invoice_processor.py:234-252), which resolves ToUnicode
  * internally; we re-derive the subset that matters for text extraction:
  *
  *   - `begincodespacerange <lo> <hi>` → code width (1 or 2 bytes)
  *   - `beginbfchar  <src> <dst>` pairs
  *   - `beginbfrange <lo> <hi> <dstStart>` (last code unit increments) and
  *     `beginbfrange <lo> <hi> [<d1> <d2> …]` (explicit array) forms
  *
  * Destination hex is UTF-16BE, so multi-unit values (surrogate pairs,
  * ligature expansions like "ffi") come through as real Unicode strings.
  * Unmapped codes fall back to the code point itself — the identity
  * behavior of a font with no CMap.
  */
final class ToUnicodeCMap(val codeBytes: Int, map: Map[Int, String]) {

  def lookup(code: Int): Option[String] = map.get(code)

  def size: Int = map.size

  /** Map a raw shown string (ISO-8859-1 chars ⇔ bytes, 1:1) through the
    * CMap. For 2-byte fonts an odd trailing byte is kept verbatim (the
    * string is malformed; dropping data would be worse).
    */
  def mapString(raw: String): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    if (codeBytes <= 1) {
      var i = 0
      while (i < raw.length) {
        val c = raw.charAt(i).toInt & 0xFF
        map.get(c) match {
          case Some(dst) => sb.append(dst)
          case None => sb.append(c.toChar)
        }
        i += 1
      }
    } else {
      var i = 0
      while (i + 1 < raw.length) {
        val code = ((raw.charAt(i).toInt & 0xFF) << 8) | (raw.charAt(i + 1).toInt & 0xFF)
        map.get(code) match {
          case Some(dst) => sb.append(dst)
          case None => sb.append(code.toChar)
        }
        i += 2
      }
      if (raw.length % 2 == 1) sb.append(raw.charAt(raw.length - 1))
    }
    sb.toString
  }
}

object ToUnicodeCMap {

  /** Per-entry range cap: a |hi-lo| beyond 16 bits is malformed input (the
    * code space itself is ≤ 2 bytes here); skip rather than materialize.
    */
  private val MaxRangeSpan = 0x10000
  /** Total-mapping cap — a denial-of-service guard for hostile inputs. */
  private val MaxEntries = 1 << 18

  private val CodeSpace =
    Pattern.compile("begincodespacerange\\s*<([0-9A-Fa-f]+)>", Pattern.DOTALL)
  private val BfCharBlock = Pattern.compile("beginbfchar(.*?)endbfchar", Pattern.DOTALL)
  private val BfCharPair =
    Pattern.compile("<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>")
  private val BfRangeBlock = Pattern.compile("beginbfrange(.*?)endbfrange", Pattern.DOTALL)
  private val BfRangeEntry = Pattern.compile(
    "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*(?:<([0-9A-Fa-f]+)>|\\[([^\\]]*)\\])",
    Pattern.DOTALL)
  private val HexItem = Pattern.compile("<([0-9A-Fa-f]+)>")

  def parse(cmapText: String): ToUnicodeCMap = {
    val map = scala.collection.mutable.HashMap.empty[Int, String]
    var codeBytes = 0 // 0 = not yet seen; inferred from first src if no codespace

    val cs = CodeSpace.matcher(cmapText)
    if (cs.find()) codeBytes = math.min(2, math.max(1, cs.group(1).length / 2))

    def noteSrcWidth(hex: String): Unit =
      if (codeBytes == 0) codeBytes = math.min(2, math.max(1, hex.length / 2))

    def utf16beToString(hex: String): String = {
      val padded = if (hex.length % 2 == 1) "0" + hex else hex
      val bytes = new Array[Byte](padded.length / 2)
      var i = 0
      while (i < bytes.length) {
        bytes(i) = Integer.parseInt(padded.substring(2 * i, 2 * i + 2), 16).toByte
        i += 1
      }
      new String(bytes, java.nio.charset.StandardCharsets.UTF_16BE)
    }

    val bc = BfCharBlock.matcher(cmapText)
    while (bc.find()) {
      val pairs = BfCharPair.matcher(bc.group(1))
      while (pairs.find() && map.size < MaxEntries) {
        noteSrcWidth(pairs.group(1))
        map(Integer.parseInt(pairs.group(1), 16)) = utf16beToString(pairs.group(2))
      }
    }

    val br = BfRangeBlock.matcher(cmapText)
    while (br.find()) {
      val entries = BfRangeEntry.matcher(br.group(1))
      while (entries.find() && map.size < MaxEntries) {
        noteSrcWidth(entries.group(1))
        val lo = Integer.parseInt(entries.group(1), 16)
        val hi = Integer.parseInt(entries.group(2), 16)
        if (hi >= lo && hi - lo < MaxRangeSpan) {
          if (entries.group(3) != null) {
            // <dstStart>: only the LAST UTF-16 code unit increments (§9.10.3
            // constrains ranges so this never overflows a unit)
            val dstHex = entries.group(3)
            val padded = if (dstHex.length % 2 == 1) "0" + dstHex else dstHex
            val base = utf16beToString(padded)
            var c = lo
            while (c <= hi && map.size < MaxEntries) {
              if (base.isEmpty) map(c) = ""
              else {
                val last = (base.charAt(base.length - 1) + (c - lo)).toChar
                map(c) = base.substring(0, base.length - 1) + last
              }
              c += 1
            }
          } else {
            val items = HexItem.matcher(entries.group(4))
            var c = lo
            while (items.find() && c <= hi && map.size < MaxEntries) {
              map(c) = utf16beToString(items.group(1))
              c += 1
            }
          }
        }
      }
    }

    new ToUnicodeCMap(if (codeBytes == 0) 1 else codeBytes, map.toMap)
  }
}
