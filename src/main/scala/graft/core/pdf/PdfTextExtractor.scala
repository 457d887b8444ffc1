package graft.core.pdf

import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/** Hand-written minimal PDF text extractor (no PDFBox in this sandbox —
  * SURVEY.md environment facts). Covers the subset our fixture generator
  * emits plus ordinary simple PDFs: linear object scan (`N G obj …
  * endobj`), `/FlateDecode` streams via `java.util.zip.Inflater`,
  * `BT/ET` text objects with `Td/TD/Tm/T*` positioning and `Tj/TJ/'/"`
  * show ops, literal `(...)` strings with escapes and `<...>` hex strings.
  *
  * Layout model: each shown string lands at the current text-space (x, y);
  * strings sharing a y (±2 units) form a line; lines are emitted top-to-
  * bottom (descending y), words left-to-right (ascending x), joined with a
  * single space; pages joined with '\n'. This mirrors the role of the
  * reference's pdfplumber scan (invoice_processor.py:234-252) without
  * porting it.
  */
object PdfTextExtractor {

  final case class Placed(x: Double, y: Double, text: String)

  /** One indirect object: number, dict text (ISO-8859-1), decoded stream
    * payload if the object carries one.
    */
  final case class PdfObj(num: Int, dict: String, payload: Option[Array[Byte]])

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-'

  /** Extract all text, pages separated by '\n'. Returns "" on any parse
    * failure (mirrors the reference's catch-and-empty policy,
    * invoice_processor.py:250-252).
    *
    * Resolution order: walk the page tree (Catalog → Pages → Kids) so pages
    * come out in declared order with their own /Resources — that is what
    * binds `Tf`-selected fonts to their /ToUnicode CMaps and makes
    * subset-font PDFs (glyph codes ≠ Unicode) readable. When no page tree
    * parses (truncated or dict-less fragments), fall back to scanning every
    * decoded stream that contains a BT text object, unmapped — the round-1
    * behavior, still right for font-less content.
    */
  def extract(bytes: Array[Byte]): String =
    try {
      val objs = scanObjects(bytes)
      val pages = pageTexts(objs).getOrElse(
        objs.flatMap(_.payload).filter(p => indexOf(p, "BT", 0) >= 0)
          .map(p => extractFromContent(p, Map.empty[String, ToUnicodeCMap])))
      pages.filter(_.nonEmpty).mkString("\n")
    } catch { case scala.util.control.NonFatal(_) => "" }

  /** Linear object scan: `N G obj … endobj`, decoding stream payloads as we
    * pass them (scanning resumes after `endstream`, so byte patterns inside
    * payloads can never be mistaken for object headers).
    */
  private def scanObjects(bytes: Array[Byte]): Seq[PdfObj] = {
    val out = ArrayBuffer.empty[PdfObj]
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val objPat = java.util.regex.Pattern.compile("(\\d+)\\s+\\d+\\s+obj\\b")
    val m = objPat.matcher(s)
    var from = 0
    while (from < s.length && m.find(from)) {
      val num = m.group(1).toInt
      val bodyStart = m.end()
      val endObj = s.indexOf("endobj", bodyStart)
      val streamKw = s.indexOf("stream", bodyStart)
      if (streamKw >= 0 && (endObj < 0 || streamKw < endObj)) {
        val dict = s.substring(bodyStart, streamKw)
        var ds = streamKw + "stream".length
        if (ds < bytes.length && bytes(ds) == '\r') ds += 1
        if (ds < bytes.length && bytes(ds) == '\n') ds += 1
        val e = indexOf(bytes, "endstream", ds)
        val end = if (e < 0) bytes.length else e
        out += PdfObj(num, dict, Some(decodePayload(bytes, dict, ds, end)))
        from = end + "endstream".length
      } else {
        val end = if (endObj < 0) s.length else endObj
        out += PdfObj(num, s.substring(bodyStart, end), None)
        from = end + "endobj".length
      }
    }
    // PDF 1.5+ object streams: catalog/page/font dicts commonly live INSIDE
    // a compressed /ObjStm, invisible to the top-level scan. Unpack them:
    // the payload is `N` (objnum, offset) integer pairs followed at /First
    // by the concatenated object bodies (dicts only — streams can't nest).
    val unpacked = ArrayBuffer.empty[PdfObj]
    out.foreach { o =>
      if (o.dict.contains("/ObjStm")) o.payload.foreach { p =>
        val nM = java.util.regex.Pattern.compile("/N\\s+(\\d+)").matcher(o.dict)
        val fM = java.util.regex.Pattern.compile("/First\\s+(\\d+)").matcher(o.dict)
        if (nM.find() && fM.find()) {
          val count = nM.group(1).toInt
          val first = fM.group(1).toInt
          if (first <= p.length && count > 0 && count < 100000) {
            val ps = new String(p, java.nio.charset.StandardCharsets.ISO_8859_1)
            val header = ps.substring(0, first).trim.split("\\s+").filter(_.nonEmpty)
            val pairs = header.grouped(2).take(count)
              .collect { case Array(n, off) if n.forall(_.isDigit) && off.forall(_.isDigit) =>
                (n.toInt, off.toInt) }.toSeq
            pairs.zipWithIndex.foreach { case ((num, off), k) =>
              val start = first + off
              val end = if (k + 1 < pairs.length) math.min(ps.length, first + pairs(k + 1)._2) else ps.length
              if (start >= 0 && start <= end) unpacked += PdfObj(num, ps.substring(start, end), None)
            }
          }
        }
      }
    }
    out.toSeq ++ unpacked
  }

  /** Slice and defilter one stream payload given its object dict. */
  private def decodePayload(bytes: Array[Byte], dict: String, ds: Int, end: Int): Array[Byte] = {
    // slice by /Length when present — trailing-EOL trimming would eat
    // deflate checksum bytes that happen to be 0x0A/0x0D
    val lenM = java.util.regex.Pattern.compile("/Length\\s+(\\d+)").matcher(dict)
    val payloadEnd =
      if (lenM.find()) math.min(end, ds + lenM.group(1).toInt)
      else trimEol(bytes, ds, end)
    var payload = java.util.Arrays.copyOfRange(bytes, ds, payloadEnd)
    // apply the /Filter chain in declared order (a [/ASCII85Decode
    // /FlateDecode] array means: 85-decode first, then inflate —
    // filters are listed in the order they must be UNDONE). Longest
    // alternatives first so "Fl" never clips "FlateDecode".
    val fm = java.util.regex.Pattern
      .compile("/(FlateDecode|ASCIIHexDecode|ASCII85Decode|AHx|A85|Fl)\\b")
      .matcher(dict)
    while (fm.find()) fm.group(1) match {
      case "FlateDecode" | "Fl"      => payload = unpredict(inflate(payload), dict)
      case "ASCIIHexDecode" | "AHx"  => payload = asciiHexDecode(payload)
      case "ASCII85Decode" | "A85"   => payload = ascii85Decode(payload)
      case _ =>
    }
    payload
  }

  /** Reverse a PNG predictor declared in /DecodeParms (§7.4.4.4): some
    * writers predictor-encode /ObjStm and xref streams. Each row is
    * `filter-byte + Columns bytes` (Colors/BitsPerComponent default 1/8
    * for the text streams we care about); filters 0–4 per PNG. Predictor
    * 1 (TIFF) and absent/unknown params leave the data untouched.
    */
  private def unpredict(data: Array[Byte], dict: String): Array[Byte] = {
    val pm = java.util.regex.Pattern.compile("/Predictor\\s+(\\d+)").matcher(dict)
    if (!pm.find()) return data
    val predictor = pm.group(1).toInt
    if (predictor < 10) return data // 1 = none, 2 = TIFF (not emitted for text streams)
    val cm = java.util.regex.Pattern.compile("/Columns\\s+(\\d+)").matcher(dict)
    val columns = if (cm.find()) cm.group(1).toInt else 1
    if (columns <= 0 || data.length % (columns + 1) != 0) return data
    val rows = data.length / (columns + 1)
    val out = new Array[Byte](rows * columns)
    var r = 0
    while (r < rows) {
      val ft = data(r * (columns + 1)) & 0xFF
      var c = 0
      while (c < columns) {
        val raw = data(r * (columns + 1) + 1 + c) & 0xFF
        val left = if (c > 0) out(r * columns + c - 1) & 0xFF else 0
        val up = if (r > 0) out((r - 1) * columns + c) & 0xFF else 0
        val upLeft = if (r > 0 && c > 0) out((r - 1) * columns + c - 1) & 0xFF else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 => // Paeth
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => raw
        }
        out(r * columns + c) = (v & 0xFF).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  private val RefPat = java.util.regex.Pattern.compile("(\\d+)\\s+\\d+\\s+R\\b")

  /** Page texts in page-tree order, or None when the tree is unusable.
    * /Resources (and thus font CMaps) inherit down Pages nodes per
    * §7.7.3.4; a page's own /Font entries win over inherited ones.
    */
  private def pageTexts(objs: Seq[PdfObj]): Option[Seq[String]] = {
    val byNum = objs.groupBy(_.num).map { case (k, v) => (k, v.last) } // later definition wins (incremental update)
    val catalog = objs.find(o => o.payload.isEmpty && o.dict.contains("/Catalog"))
    val rootRef = catalog.flatMap { c =>
      val m = java.util.regex.Pattern.compile("/Pages\\s+(\\d+)\\s+\\d+\\s+R").matcher(c.dict)
      if (m.find()) Some(m.group(1).toInt) else None
    }
    rootRef.flatMap { root =>
      val pages = ArrayBuffer.empty[String]
      val visited = scala.collection.mutable.HashSet.empty[Int]

      def fontsOf(dict: String, inherited: Map[String, ToUnicodeCMap]): Map[String, ToUnicodeCMap] = {
        // /Resources may be inline (nested dict already inside `dict`) or a ref
        var hay = dict
        val rr = java.util.regex.Pattern.compile("/Resources\\s+(\\d+)\\s+\\d+\\s+R").matcher(dict)
        if (rr.find()) byNum.get(rr.group(1).toInt).foreach(o => hay = hay + "\n" + o.dict)
        val fd = java.util.regex.Pattern.compile("/Font\\s*<<([^>]*)>>").matcher(hay)
        if (!fd.find()) inherited
        else {
          val entries = java.util.regex.Pattern
            .compile("/([^\\s/<>\\[\\]()]+)\\s+(\\d+)\\s+\\d+\\s+R").matcher(fd.group(1))
          var fonts = inherited
          while (entries.find()) {
            val name = entries.group(1)
            val cmap = byNum.get(entries.group(2).toInt).flatMap { fontObj =>
              val tu = java.util.regex.Pattern.compile("/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R").matcher(fontObj.dict)
              if (tu.find())
                byNum.get(tu.group(1).toInt).flatMap(_.payload).map(p =>
                  ToUnicodeCMap.parse(new String(p, java.nio.charset.StandardCharsets.ISO_8859_1)))
              else {
                // no ToUnicode: fall back to /Encoding /Differences glyph
                // names (§9.6.6) — inline dict text or an encoding object ref
                var encText = fontObj.dict
                val er = java.util.regex.Pattern.compile("/Encoding\\s+(\\d+)\\s+\\d+\\s+R").matcher(fontObj.dict)
                if (er.find()) byNum.get(er.group(1).toInt).foreach(o => encText = encText + "\n" + o.dict)
                Option(Encodings.differencesCMap(encText))
              }
            }
            cmap match {
              case Some(c) => fonts = fonts.updated(name, c)
              case None    => fonts = fonts - name // font without CMap shadows an inherited name
            }
          }
          fonts
        }
      }

      def walk(num: Int, inheritedFonts: Map[String, ToUnicodeCMap], depth: Int): Unit = {
        if (depth > 64 || !visited.add(num)) return
        byNum.get(num).foreach { node =>
          val fonts = fontsOf(node.dict, inheritedFonts)
          val kids = java.util.regex.Pattern.compile("/Kids\\s*\\[([^\\]]*)\\]").matcher(node.dict)
          if (kids.find()) {
            val refs = RefPat.matcher(kids.group(1))
            while (refs.find()) walk(refs.group(1).toInt, fonts, depth + 1)
          } else {
            // leaf page: /Contents single ref or array of refs, streams
            // concatenated (token boundaries align with stream boundaries, §7.8.2)
            val contentRefs = ArrayBuffer.empty[Int]
            val arr = java.util.regex.Pattern.compile("/Contents\\s*\\[([^\\]]*)\\]").matcher(node.dict)
            if (arr.find()) {
              val refs = RefPat.matcher(arr.group(1))
              while (refs.find()) contentRefs += refs.group(1).toInt
            } else {
              val one = java.util.regex.Pattern.compile("/Contents\\s+(\\d+)\\s+\\d+\\s+R").matcher(node.dict)
              if (one.find()) contentRefs += one.group(1).toInt
            }
            val payloads = contentRefs.toSeq.flatMap(r => byNum.get(r).flatMap(_.payload))
            if (payloads.nonEmpty) {
              val joined = new java.io.ByteArrayOutputStream()
              payloads.foreach { p => joined.write(p); joined.write('\n') }
              pages += extractFromContent(joined.toByteArray, fonts)
            }
          }
        }
      }

      walk(root, Map.empty, 0)
      if (pages.nonEmpty) Some(pages.toSeq) else None
    }
  }

  private def trimEol(bytes: Array[Byte], start: Int, end: Int): Int = {
    var e = end
    while (e > start && (bytes(e - 1) == '\n' || bytes(e - 1) == '\r')) e -= 1
    e
  }

  /** ASCIIHexDecode (PDF 7.4.2): hex pairs, whitespace skipped, `>` is
    * EOD, an odd trailing digit is padded with 0.
    */
  private def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else -1
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4) // odd digit padded with 0
        done = true
      } else if (d >= 0) {
        if (hi < 0) hi = d
        else { out.write((hi << 4) | d); hi = -1 }
      } // anything else (whitespace/junk) skipped
      i += 1
    }
    if (!done && hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** ASCII85Decode (PDF 7.4.3): 5 chars of '!'..'u' → 4 bytes (base 85),
    * `z` → four zero bytes, whitespace skipped, `~>` is EOD; a partial
    * final group of n chars (padded with 'u') yields n-1 bytes.
    */
  private def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5)
    val grp = new Array[Int](5)
    var gn = 0
    var i = 0
    // skip the optional <~ header
    if (data.length >= 2 && data(0) == '<' && data(1) == '~') i = 2
    var done = false
    def flush(n: Int): Unit = { // n chars of the group are real
      var k = gn
      while (k < 5) { grp(k) = 84; k += 1 } // pad with 'u'
      var v = 0L
      var j = 0
      while (j < 5) { v = v * 85 + grp(j); j += 1 }
      val bytesOut = n - 1
      var b = 0
      while (b < bytesOut) { out.write(((v >>> (24 - 8 * b)) & 0xFF).toInt); b += 1 }
      gn = 0
    }
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') { // EOD
        if (gn > 0) flush(gn)
        done = true
      } else if (c == 'z' && gn == 0) {
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (c >= '!' && c <= 'u') {
        grp(gn) = c - '!'; gn += 1
        if (gn == 5) flush(5)
      } // whitespace/junk skipped
      i += 1
    }
    if (!done && gn > 0) flush(gn)
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val buf = new java.io.ByteArrayOutputStream(data.length * 4)
      val tmp = new Array[Byte](8192)
      var stalled = false
      while (!inf.finished() && !inf.needsInput() && !stalled) {
        val k = inf.inflate(tmp)
        if (k == 0 && !inf.finished()) stalled = true
        else buf.write(tmp, 0, k)
      }
      buf.toByteArray
    } finally inf.end() // native zlib memory — must not wait for GC
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val nb = needle.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = math.max(0, from)
    val limit = hay.length - nb.length
    while (i <= limit) {
      var j = 0
      while (j < nb.length && hay(i + j) == nb(j)) j += 1
      if (j == nb.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: String, before: Int): Int = {
    val nb = needle.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = math.min(before, hay.length) - nb.length
    while (i >= 0) {
      var j = 0
      while (j < nb.length && hay(i + j) == nb(j)) j += 1
      if (j == nb.length) return i
      i -= 1
    }
    -1
  }

  /** Parse one content stream: tokenizes operands/operators and tracks the
    * text cursor through BT/ET blocks. Font-less entry point (tests, BT-scan
    * fallback).
    */
  def extractFromContent(content: Array[Byte]): String =
    extractFromContent(content, Map.empty[String, ToUnicodeCMap])

  /** As above, with the page's font resources: `Tf` selects the current
    * font, and shown strings pass through its /ToUnicode CMap (glyph codes
    * → Unicode). A font with no CMap shows codes verbatim — correct for the
    * standard-encoded fonts our generator emits.
    */
  def extractFromContent(content: Array[Byte], fonts: Map[String, ToUnicodeCMap]): String = {
    val s = new String(content, java.nio.charset.StandardCharsets.ISO_8859_1)
    val placed = ArrayBuffer.empty[Placed]
    var x = 0.0; var y = 0.0        // current text position
    var lineX = 0.0; var lineY = 0.0 // start-of-line position
    var leading = 12.0
    var inText = false
    var cmap: ToUnicodeCMap = null  // current font's ToUnicode, if any
    val operands = ArrayBuffer.empty[Any]
    var i = 0
    val n = s.length

    def num(a: Any): Double = a match {
      case d: Double => d
      case _ => 0.0
    }

    def show(raw: String): Unit = {
      val str = if (cmap == null) raw else cmap.mapString(raw)
      if (str.nonEmpty) placed += Placed(x, y, str)
      x += str.length * 6.0 // nominal advance; only relative order matters
    }

    def newline(): Unit = { lineY -= leading; x = lineX; y = lineY }

    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '%') { while (i < n && s.charAt(i) != '\n') i += 1 }
      else if (c == '(') { // literal string
        val sb = new java.lang.StringBuilder
        var depth = 1; i += 1
        while (i < n && depth > 0) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            val e = s.charAt(i + 1)
            e match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case '(' => sb.append('('); i += 2
              case ')' => sb.append(')'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case d if d >= '0' && d <= '7' =>
                var k = i + 1; var v = 0; var cnt = 0
                while (k < n && cnt < 3 && s.charAt(k) >= '0' && s.charAt(k) <= '7') { v = v * 8 + (s.charAt(k) - '0'); k += 1; cnt += 1 }
                sb.append(v.toChar); i = k
              case '\r' =>
                // backslash-EOL is a line continuation (PDF 32000-1 §7.3.4.2):
                // both the backslash and the EOL are omitted; \r\n counts as one EOL
                i += 2; if (i < n && s.charAt(i) == '\n') i += 1
              case '\n' => i += 2
              case _ => sb.append(e); i += 2
            }
          } else if (ch == '(') { depth += 1; sb.append(ch); i += 1 }
          else if (ch == ')') { depth -= 1; if (depth > 0) sb.append(ch); i += 1 }
          else { sb.append(ch); i += 1 }
        }
        operands += sb.toString
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') { // hex string
        val e = s.indexOf('>', i + 1)
        val hex = s.substring(i + 1, if (e < 0) n else e).filterNot(_.isWhitespace)
        val padded = if (hex.length % 2 == 1) hex + "0" else hex
        val sb = new java.lang.StringBuilder
        var k = 0
        while (k + 1 < padded.length + 1 && k + 2 <= padded.length) {
          sb.append(Integer.parseInt(padded.substring(k, k + 2), 16).toChar); k += 2
        }
        operands += sb.toString
        i = if (e < 0) n else e + 1
      } else if (c == '<') { // dict <<…>> (inline image / marked content) — skip to matching >>
        var depth = 0
        var done = false
        while (i < n && !done) {
          if (i + 1 < n && s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
          else if (i + 1 < n && s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
            depth -= 1; i += 2
            if (depth <= 0) done = true
          } else i += 1
        }
      } else if (c == '[') { operands += "["; i += 1 }
      else if (c == ']') { // fold array items above the "[" marker
        val items = ArrayBuffer.empty[Any]
        var done = false
        while (operands.nonEmpty && !done) {
          operands.remove(operands.length - 1) match {
            case "[" => done = true
            case v => items.insert(0, v)
          }
        }
        operands += items.toList
        i += 1
      } else if (c == '/') { // name
        var j = i + 1
        while (j < n && !s.charAt(j).isWhitespace && "()<>[]{}/%".indexOf(s.charAt(j)) < 0) j += 1
        operands += ("/" + s.substring(i + 1, j)); i = j
      } else if (c == '-' || c == '+' || c == '.' || c.isDigit) { // number
        var j = i + 1
        while (j < n && (s.charAt(j).isDigit || s.charAt(j) == '.' || s.charAt(j) == '-' || s.charAt(j) == '+')) j += 1
        operands += (try s.substring(i, j).toDouble catch { case _: NumberFormatException => 0.0 })
        i = j
      } else { // operator
        var j = i
        while (j < n && !s.charAt(j).isWhitespace && "()<>[]{}/%".indexOf(s.charAt(j)) < 0 && !s.charAt(j).isDigit) j += 1
        if (j == i) { i += 1 }
        else {
          val op = s.substring(i, j)
          op match {
            case "BI" =>
              // inline image (§8.9.7): BI <dict> ID <raw binary> EI — the
              // payload is arbitrary bytes (parens, "Tj", anything), so it
              // MUST be skipped, not tokenized. Find ID, then the first
              // whitespace-delimited EI.
              val idPos = s.indexOf("ID", j)
              if (idPos < 0) { i = n }
              else {
                var k = idPos + 2
                if (k < n && s.charAt(k).isWhitespace) k += 1 // single EOL/space after ID
                var end = -1
                while (end < 0 && k + 1 < n) {
                  if (s.charAt(k) == 'E' && s.charAt(k + 1) == 'I' &&
                      (k == 0 || s.charAt(k - 1).isWhitespace) &&
                      (k + 2 >= n || s.charAt(k + 2).isWhitespace)) end = k + 2
                  else k += 1
                }
                i = if (end < 0) n else end
              }
              operands.clear()
              // skip the shared operand-clear below (i already advanced)
              j = i
            case "BT" => inText = true; x = 0; y = 0; lineX = 0; lineY = 0
            case "ET" => inText = false
            case "Td" if operands.length >= 2 =>
              lineX += num(operands(operands.length - 2)); lineY += num(operands.last)
              x = lineX; y = lineY
            case "TD" if operands.length >= 2 =>
              leading = -num(operands.last)
              lineX += num(operands(operands.length - 2)); lineY += num(operands.last)
              x = lineX; y = lineY
            case "Tm" if operands.length >= 6 =>
              lineX = num(operands(operands.length - 2)); lineY = num(operands.last)
              x = lineX; y = lineY
            case "T*" => newline()
            case "TL" if operands.nonEmpty => leading = num(operands.last)
            case "Tf" if operands.length >= 2 =>
              operands(operands.length - 2) match {
                case name: String if name.startsWith("/") =>
                  cmap = fonts.getOrElse(name.substring(1), null)
                case _ => ()
              }
            case "Tj" if operands.nonEmpty && inText =>
              operands.last match { case str: String => show(str); case _ => () }
            case "'" if operands.nonEmpty && inText =>
              newline()
              operands.last match { case str: String => show(str); case _ => () }
            case "\"" if operands.nonEmpty && inText =>
              newline()
              operands.last match { case str: String => show(str); case _ => () }
            case "TJ" if operands.nonEmpty && inText =>
              operands.last match {
                case items: List[_] =>
                  // one text run: segments concatenate (kern numbers only
                  // shift x; a large negative kern is still intra-run)
                  val sb = new java.lang.StringBuilder
                  items.foreach {
                    case str: String => sb.append(str)
                    case _ => ()
                  }
                  show(sb.toString)
                case _ => ()
              }
            case _ => ()
          }
          operands.clear()
          i = j
        }
      }
    }
    extractPlacedText(placed)
  }

  private def extractPlacedText(placed: ArrayBuffer[Placed]): String = {
    if (placed.isEmpty) return ""
    // group into lines by y (tolerance 2 units), top-to-bottom
    val sorted = placed.sortBy(p => (-p.y, p.x))
    val sb = new java.lang.StringBuilder
    var curY = Double.NaN
    var firstLine = true
    var firstOnLine = true
    sorted.foreach { p =>
      if (curY.isNaN || math.abs(p.y - curY) > 2.0) {
        if (!firstLine) sb.append('\n')
        curY = p.y; firstLine = false; firstOnLine = true
      }
      if (!firstOnLine) sb.append(' ')
      sb.append(p.text)
      firstOnLine = false
    }
    sb.toString
  }
}
