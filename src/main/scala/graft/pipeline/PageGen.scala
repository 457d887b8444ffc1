package graft.pipeline

import graft.core.Splitmix64
import java.nio.charset.StandardCharsets.UTF_8

/** Deterministic synthetic pages-table generator (FIXTURES.md §1).
  *
  * Every choice is a pure function of (seed, rowIndex) via splitmix64 — no
  * wall clock, no `scala.util.Random` — so the table is byte-identical
  * across runs, partitionings, and parallelism levels. Hosts follow a
  * skewed (Zipf-ish) distribution so a few hosts are hot, exercising the
  * salting path; ~1/8 of payloads are minimal PDFs (uncompressed and
  * FlateDecode variants); a small slice has malformed markup, non-UTF-8
  * bytes, or empty payloads (fallback-text path).
  */
object PageGen {
  val DefaultSeed = 42L

  private val words: Array[String] = Array(
    "the", "quick", "brown", "rice", "market", "supply", "quality", "harvest",
    "season", "export", "delivery", "contract", "village", "mill", "storage",
    "premium", "grade", "moisture", "packed", "shipment", "inspection",
    "certified", "organic", "paddy", "basmati", "steam", "kolam", "sella",
    "broken", "polished", "sortex", "golden", "traders", "wholesale", "retail",
    "monsoon", "yield", "acreage", "procurement", "warehouse", "logistics",
    "invoice", "payment", "credit", "terms", "dispatch", "consignment",
    "weighbridge", "gunny", "jute", "transport", "freight", "insurance")

  private val hosts: Array[String] = (0 until 64).map {
    case 0 => "bigmill.example.com"
    case 1 => "agro-news.example.org"
    case 2 => "rice-trade.example.net"
    case i => s"host$i.example.com"
  }.toArray

  private val langs = Array("en", "en", "en", "en", "en", "en", "hi", "ta", "de", "fr")

  private val companies = Array(
    "SHRI BIRLA RICE MILL", "A M AGRO INDUSTRIES", "GOLDEN HARVEST RICE MILL",
    "SUNRISE AGRO INDUSTRIES", "KAVERI RICE MILL", "NATIONAL FOODS LIMITED",
    "EVERGREEN TRADERS PVT LTD", "LAKSHMI RICE MILL")

  private val productNames = Array(
    "STEAM KOLAM RICE", "BASMATI SELLA RICE", "BROKEN RICE 100%",
    "SORTEX CLEAN RICE", "GOLDEN SELLA BASMATI", "RAW PADDY",
    "POLISHED WHITE RICE", "LOOSE RICE")

  private def rng(seed: Long, i: Long, stream: Int): Long =
    Splitmix64.at(Splitmix64.mix(seed ^ (stream.toLong << 32)), i)

  private def pick[T](arr: Array[T], raw: Long): T = arr(Splitmix64.bounded(raw, arr.length))

  private def sentence(seed: Long, i: Long, stream: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder
    var k = 0
    while (k < n) {
      if (k > 0) sb.append(' ')
      sb.append(pick(words, rng(seed, i * 131 + k, stream)))
      k += 1
    }
    sb.toString
  }

  /** Zipf-ish host index: u^3 skew → host 0 gets ~20% of pages. */
  def hostIndex(seed: Long, i: Long): Int = {
    val u = Splitmix64.toDouble(rng(seed, i, 1))
    math.min(hosts.length - 1, (u * u * u * hosts.length).toInt)
  }

  def url(seed: Long, i: Long): String = {
    val h = hosts(hostIndex(seed, i))
    val section = pick(Array("news", "market", "prices", "docs", "blog", "listings"), rng(seed, i, 2))
    s"https://$h/$section/page-$i.html"
  }

  // ---- invoice-ish main content -------------------------------------------

  private def dateString(seed: Long, i: Long): String = {
    val d = 1 + Splitmix64.bounded(rng(seed, i, 10), 28)
    val mo = 1 + Splitmix64.bounded(rng(seed, i, 11), 12)
    val yr = 2021 + Splitmix64.bounded(rng(seed, i, 12), 4)
    Splitmix64.bounded(rng(seed, i, 13), 3) match {
      case 0 => s"$d/$mo/$yr"
      case 1 => s"$d-$mo-${yr % 100}"
      case _ => s"$yr-$mo-$d"
    }
  }

  /** One invoice table in the reference's `--- TABLE i.j ---` serialization
    * (invoice_processor.py:295-300), format selected per row.
    */
  private def invoiceTable(seed: Long, i: Long, format: Int): String = {
    val nRows = 1 + Splitmix64.bounded(rng(seed, i, 20), 3)
    val sb = new java.lang.StringBuilder
    sb.append("\n--- TABLE 1.1 ---\n")
    format match {
      case 0 => // problematic/birla: BAGS / NET PER BAG / NET / Rate
        sb.append("Description | HSN | BAGS | NET (Kg) PER BAG | NET | Rate | Amount\n")
        var r = 0
        while (r < nRows) {
          val bags = 50 + Splitmix64.bounded(rng(seed, i * 17 + r, 21), 450)
          val perBag = pick(Array(25, 26, 30, 50), rng(seed, i * 17 + r, 22))
          val net = bags * perBag
          val rate = 1800 + Splitmix64.bounded(rng(seed, i * 17 + r, 23), 2800)
          val amount = net.toLong * rate / 100
          sb.append(s"${pick(productNames, rng(seed, i * 17 + r, 24))} | 1006${30 + r}0 | $bags | $perBag | $net | $rate | $amount\n")
          r += 1
        }
      case 1 => // agro: BAG/PKG/QUANTITY/RATE/PER
        sb.append("Description | HSN/SAC | Batch | Bag | Pkg | Quantity | Rate | Per | Amount\n")
        var r = 0
        while (r < nRows) {
          val bag = 100 + Splitmix64.bounded(rng(seed, i * 17 + r, 21), 400)
          val qty = (Splitmix64.bounded(rng(seed, i * 17 + r, 22), 9000) + 100) / 100.0
          val rate = 3000 + Splitmix64.bounded(rng(seed, i * 17 + r, 23), 3000)
          val amount = (qty * 1000 * rate / 100).toLong
          sb.append(s"${pick(productNames, rng(seed, i * 17 + r, 24))} | 100630${r} | ${500 + r} | $bag | 0.${r + 1} | $qty | $rate | KGS | $amount\n")
          r += 1
        }
      case 2 => // pattern_a: DESCRIPTION/HSN/QUANTITY/WEIGHT/RATE/AMOUNT
        sb.append("DESCRIPTION | HSN | QUANTITY | WEIGHT | RATE | AMOUNT\n")
        var r = 0
        while (r < nRows) {
          val qty = 10 + Splitmix64.bounded(rng(seed, i * 17 + r, 21), 900)
          val unit = pick(Array("kg", "qtl", "ton"), rng(seed, i * 17 + r, 25))
          val w = 10 + Splitmix64.bounded(rng(seed, i * 17 + r, 22), 400)
          val rate = 2000 + Splitmix64.bounded(rng(seed, i * 17 + r, 23), 3000)
          sb.append(s"${pick(productNames, rng(seed, i * 17 + r, 24))} | 1006${10 + r} | $qty | $w $unit | $rate | ${w.toLong * rate}\n")
          r += 1
        }
      case _ => // pattern_b: ITEM/QTY/RATE/AMOUNT
        sb.append("ITEM | QTY | RATE | AMOUNT\n")
        var r = 0
        while (r < nRows) {
          val qty = 5 + Splitmix64.bounded(rng(seed, i * 17 + r, 21), 200)
          val rate = 100 + Splitmix64.bounded(rng(seed, i * 17 + r, 23), 5000)
          sb.append(s"${pick(productNames, rng(seed, i * 17 + r, 24))} | $qty | $rate | ${qty.toLong * rate}\n")
          r += 1
        }
    }
    sb.toString
  }

  /** Plain-text main content: company/header lines + prose + table. */
  def mainContent(seed: Long, i: Long): String = {
    val format = Splitmix64.bounded(rng(seed, i, 30), 4)
    val company = if (format == 0) "SHRI BIRLA RICE MILL"
      else if (format == 1) "A M AGRO INDUSTRIES"
      else pick(companies, rng(seed, i, 31))
    val inv = 100 + Splitmix64.bounded(rng(seed, i, 32), 9900)
    val fssai = 10000000000000L + (rng(seed, i, 33) >>> 20)
    val sb = new java.lang.StringBuilder
    sb.append(s"M/s $company\n")
    sb.append(s"Invoice No. : $inv-${Splitmix64.bounded(rng(seed, i, 34), 90) + 10}\n")
    sb.append(s"Date of Invoice : ${dateString(seed, i)}\n")
    sb.append(s"FSSAI : $fssai\n")
    sb.append(sentence(seed, i, 35, 18 + Splitmix64.bounded(rng(seed, i, 36), 25))).append('\n')
    sb.append(invoiceTable(seed, i, format))
    sb.append("TOTAL | | | | ").append(100000 + Splitmix64.bounded(rng(seed, i, 37), 900000)).append('\n')
    sb.append("Amount in words: ").append(sentence(seed, i, 38, 6)).append('\n')
    sb.append(sentence(seed, i, 39, 15 + Splitmix64.bounded(rng(seed, i, 40), 20)))
    sb.toString
  }

  // ---- HTML assembly ------------------------------------------------------

  private def navBlock(seed: Long, i: Long, stream: Int): String = {
    val sb = new java.lang.StringBuilder("<nav><ul>")
    var k = 0
    val n = 4 + Splitmix64.bounded(rng(seed, i, stream), 5)
    while (k < n) {
      sb.append(s"""<li><a href="/${pick(words, rng(seed, i * 7 + k, stream + 1))}">${pick(words, rng(seed, i * 7 + k, stream + 2))} ${pick(words, rng(seed, i * 7 + k, stream + 3))}</a></li>""")
      k += 1
    }
    sb.append("</ul></nav>").toString
  }

  def htmlPage(seed: Long, i: Long): String = {
    val content = mainContent(seed, i)
    val title = sentence(seed, i, 50, 5)
    val sb = new java.lang.StringBuilder
    sb.append("<!DOCTYPE html><html><head><title>").append(title)
      .append("</title><script>var x = 1 < 2 && 3 > 2;</script><style>.a{color:red}</style>")
    // head signals a real crawl carries (none of them touch body content, so
    // extracted text and every golden fixture stay byte-identical):
    //  ~1/12 of pages declare a canonical link — groups of up to 4
    //  consecutive indices point at their quad's base url, forming
    //  site-declared duplicate clusters the curation stage must merge
    if (Splitmix64.bounded(rng(seed, i, 90), 12) == 0)
      sb.append("<link rel=\"canonical\" href=\"").append(url(seed, (i / 4) * 4)).append("\">")
    //  ~1/20 of pages opt out via robots noindex — the curation gate drops them
    if (Splitmix64.bounded(rng(seed, i, 91), 20) == 0)
      sb.append("<meta name=\"robots\" content=\"noindex, nofollow\">")
    sb.append("</head><body>")
    sb.append("<header>").append(navBlock(seed, i, 60)).append("</header>")
    sb.append(navBlock(seed, i, 63))
    // main content: header fields as <p> lines, table rows inside <pre>
    sb.append("<article><h1>").append(title).append("</h1>")
    content.split("\n", -1).foreach { line =>
      if (line.startsWith("---") || line.contains(" | "))
        sb.append("<pre>").append(escape(line)).append("</pre>")
      else if (line.nonEmpty)
        sb.append("<p>").append(escape(line)).append("</p>")
    }
    sb.append("</article>")
    // link-heavy sidebar + footer boilerplate
    sb.append("<aside>").append(navBlock(seed, i, 66)).append("</aside>")
    sb.append("<footer><p><a href=\"/about\">about</a> <a href=\"/contact\">contact</a> ")
      .append("<a href=\"/terms\">terms &amp; conditions</a> &copy; 2025</p></footer>")
    // a slice of malformed markup (unclosed tags, stray '<')
    if (Splitmix64.bounded(rng(seed, i, 70), 10) == 0)
      sb.append("<div><p>unclosed ").append(pick(words, rng(seed, i, 71))).append(" 1 < 2")
    sb.append("</body></html>")
    sb.toString
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  // ---- minimal PDF assembly ----------------------------------------------

  /** Build a 1-page minimal PDF whose content stream shows `text` line by
    * line (72,720 origin, 14pt leading). `flate` selects FlateDecode.
    */
  def pdfBytes(text: String, flate: Boolean): Array[Byte] = {
    val esc = text.split("\n", -1).map(_.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)"))
    val cs = new java.lang.StringBuilder("BT\n/F1 12 Tf\n72 720 Td\n14 TL\n")
    esc.zipWithIndex.foreach { case (line, k) =>
      if (k == 0) cs.append("(").append(line).append(") Tj\n")
      else cs.append("0 -14 Td\n(").append(line).append(") Tj\n")
    }
    cs.append("ET\n")
    var payload = cs.toString.getBytes(UTF_8)
    var filter = ""
    if (flate) {
      val d = new java.util.zip.Deflater()
      d.setInput(payload); d.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) { val k = d.deflate(tmp); buf.write(tmp, 0, k) }
      d.end()
      payload = buf.toByteArray
      filter = "/Filter /FlateDecode "
    }
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n")
    w(s"4 0 obj\n<< ${filter}/Length ${payload.length} >>\nstream\n")
    out.write(payload)
    w("\nendstream\nendobj\n")
    w("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  /** Build a 1-page PDF with a SUBSET font: each distinct character's glyph
    * code is its first-appearance index (1-based), so the raw shown bytes
    * are meaningless control codes and the ONLY route back to text is the
    * embedded /ToUnicode CMap (PDF 32000-1 §9.10.3). This is the shape
    * office exporters and print-to-PDF drivers emit for embedded-subset
    * fonts — the reference reads them via pdfplumber's ToUnicode handling
    * (invoice_processor.py:234-252). `twoByte` emits Identity-H-style
    * 2-byte codes shown as hex strings; 1-byte mode caps at 255 distinct
    * characters (later characters fall back to '?', like a real subset
    * would drop to .notdef).
    */
  def subsetFontPdfBytes(text: String, twoByte: Boolean): Array[Byte] = {
    val glyphs = scala.collection.mutable.LinkedHashMap.empty[Char, Int]
    text.foreach { c =>
      if (c != '\n' && !glyphs.contains(c)) {
        val code = glyphs.size + 1
        if (twoByte || code <= 0xFF) glyphs(c) = code
      }
    }
    val hexW = if (twoByte) 4 else 2
    def codeHex(c: Char): String =
      glyphs.get(c).map(v => ("%0" + hexW + "X").format(v)).getOrElse(("%0" + hexW + "X").format(glyphs.getOrElse('?', 1)))
    val cs = new java.lang.StringBuilder("BT\n/F1 12 Tf\n72 720 Td\n14 TL\n")
    text.split("\n", -1).zipWithIndex.foreach { case (line, k) =>
      if (k > 0) cs.append("0 -14 Td\n")
      cs.append("<").append(line.map(codeHex).mkString).append("> Tj\n")
    }
    cs.append("ET\n")
    val d = new java.util.zip.Deflater()
    d.setInput(cs.toString.getBytes(UTF_8)); d.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val ztmp = new Array[Byte](8192)
    while (!d.finished()) { val k = d.deflate(ztmp); zbuf.write(ztmp, 0, k) }
    d.end()
    val payload = zbuf.toByteArray
    val space = if (twoByte) "<0000> <FFFF>" else "<01> <FF>"
    val cmap = new java.lang.StringBuilder()
    cmap.append("/CIDInit /ProcSet findresource begin\nbegincmap\n")
      .append("1 begincodespacerange ").append(space).append(" endcodespacerange\n")
      .append(glyphs.size).append(" beginbfchar\n")
    glyphs.foreach { case (c, code) =>
      cmap.append("<").append(("%0" + hexW + "X").format(code)).append("> <")
        .append(f"${c.toInt}%04X").append(">\n")
    }
    cmap.append("endbfchar\nendcmap\nend\n")
    val cmapBytes = cmap.toString.getBytes(UTF_8)
    val subtype = if (twoByte) "/Subtype /Type0 /Encoding /Identity-H" else "/Subtype /TrueType"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n")
    w(s"4 0 obj\n<< /Filter /FlateDecode /Length ${payload.length} >>\nstream\n")
    out.write(payload)
    w("\nendstream\nendobj\n")
    w(s"5 0 obj\n<< /Type /Font $subtype /BaseFont /GRAFTX+Subset /ToUnicode 6 0 R >>\nendobj\n")
    w(s"6 0 obj\n<< /Length ${cmapBytes.length} >>\nstream\n")
    out.write(cmapBytes)
    w("\nendstream\nendobj\n")
    w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  // ---- row assembly -------------------------------------------------------

  /** Payload kind: 0-9 HTML, 10 = uncompressed PDF, 11 = flate PDF,
    * 12 = empty payload (fallback text), 13 = invalid UTF-8 HTML.
    */
  def kind(seed: Long, i: Long): Int = {
    val k = Splitmix64.bounded(rng(seed, i, 80), 16)
    if (k <= 9) 0 else if (k <= 11) 10 else if (k == 12) 11 else if (k == 13) 12 else 13
  }

  def page(seed: Long, i: Long): Page = {
    val k = kind(seed, i)
    val ts = new java.sql.Timestamp(
      1748736000000L + // 2025-06-01T00:00:00Z
        (Splitmix64.bounded(rng(seed, i, 81), 10) * 86400000L) +
        Splitmix64.bounded(rng(seed, i, 82), 86400000))
    val lang = pick(langs, rng(seed, i, 83))
    val content = mainContent(seed, i)
    val (html, fallback) = k match {
      case 0 => (htmlPage(seed, i).getBytes(UTF_8), "")
      case 10 => (pdfBytes(content, flate = false), "")
      case 11 => (pdfBytes(content, flate = true), "")
      case 12 => (Array.empty[Byte], content) // empty payload → text fallback
      case _ =>
        // valid HTML with an invalid UTF-8 byte sequence spliced in
        val good = htmlPage(seed, i).getBytes(UTF_8)
        val bad = java.util.Arrays.copyOf(good, good.length + 3)
        bad(good.length) = 0xC3.toByte; bad(good.length + 1) = 0x28.toByte; bad(good.length + 2) = 0xFF.toByte
        (bad, "")
    }
    Page(url(seed, i), ts, html, fallback, lang)
  }
}
