package graft.core.warc

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1

/** One WARC record (ISO 28500): headers + raw payload block. For
  * `response` records the HTTP headers are split from the body so the
  * caller gets the entity bytes a crawl pipeline actually wants.
  */
final case class WarcRecord(
    warcType: String,
    targetUri: String,
    date: String,
    contentType: String,
    httpStatus: Int,          // -1 when the payload is not an HTTP message
    httpContentType: String,  // from the HTTP headers, "" if absent
    body: Array[Byte],        // HTTP entity body for responses, else the raw block
    // revisit/dedup plumbing (ISO 28500 §6.7.2 + the netpreserve
    // identical-payload-digest profile): "" when absent, so plain
    // response-only archives parse exactly as before
    payloadDigest: String = "",  // WARC-Payload-Digest, e.g. sha1:BASE32
    refersToUri: String = "",    // WARC-Refers-To-Target-URI (revisit only)
    refersToDate: String = "")   // WARC-Refers-To-Date (revisit only)

/** Streaming WARC parser: `records(in)` lazily yields records from a
  * plain or gzipped stream. Common Crawl writes ONE GZIP MEMBER PER
  * RECORD concatenated into a .warc.gz — `GZIPInputStream` reads
  * multi-member streams natively, so the same code path covers both
  * layouts. Framing is `Content-Length` driven (the only correct way:
  * payloads are binary and contain anything), with the record separator
  * CRLFCRLF consumed after each block.
  *
  * Malformed tails (truncated final record, junk after the last
  * separator) end iteration instead of throwing: a 1 GB crawl segment
  * with a torn tail should yield its good records.
  */
object WarcReader {

  def isGzip(first2: Array[Byte]): Boolean =
    first2.length >= 2 && (first2(0) & 0xFF) == 0x1F && (first2(1) & 0xFF) == 0x8B

  def records(raw: InputStream): Iterator[WarcRecord] = {
    val buffered = new BufferedInputStream(raw, 1 << 16)
    buffered.mark(2)
    val magic = new Array[Byte](2)
    val got = buffered.read(magic)
    buffered.reset()
    val in: InputStream =
      if (got == 2 && isGzip(magic)) new java.util.zip.GZIPInputStream(buffered, 1 << 16)
      else buffered

    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false
      // a resync found the next record's version line before readOne ran
      private var pendingVersionLine: String = null

      /** Best-effort resync after ONE malformed record: scan forward for a
        * line starting with "WARC/" and resume there. A single bad header
        * (non-numeric Content-Length, corrupt record) must not silently
        * drop every remaining record of an otherwise-good multi-member
        * segment.
        */
      private def resync(): Unit = {
        var l = readLine(in)
        while (l != null && !l.startsWith("WARC/")) l = readLine(in)
        if (l == null) done = true else pendingVersionLine = l
      }

      private def advance(): Unit = {
        while (nextRec == null && !done) {
          try {
            val first = pendingVersionLine
            pendingVersionLine = null
            readOne(in, first) match {
              case ReadEof => done = true
              case ReadOk(r) => nextRec = r
              case ReadMalformed => resync()
            }
          } catch {
            case _: EOFException => done = true
            case scala.util.control.NonFatal(_) => done = true // torn tail
          }
        }
      }
      def hasNext: Boolean = { advance(); !done }
      def next(): WarcRecord = {
        advance()
        if (done) throw new NoSuchElementException("WARC stream exhausted")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  private sealed trait ReadResult
  private final case class ReadOk(rec: WarcRecord) extends ReadResult
  private case object ReadEof extends ReadResult
  private case object ReadMalformed extends ReadResult

  /** Read a single record; EOF at a record boundary, or a malformed header
    * (non-numeric / absurd Content-Length, desynced version line) that the
    * caller should resync past.
    *
    * @param firstLine a version line a prior resync already consumed, or null
    */
  private def readOne(in: InputStream, firstLine: String): ReadResult = {
    var line = if (firstLine != null) firstLine else readLine(in)
    // skip blank separator lines between records
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return ReadEof
    if (!line.startsWith("WARC/")) return ReadMalformed // desynced: resync
    val headers = scala.collection.mutable.HashMap.empty[String, String]
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      val c = h.indexOf(':')
      if (c > 0) headers(h.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)) =
        h.substring(c + 1).trim
      h = readLine(in)
    }
    // a malformed Content-Length poisons only THIS record, not the segment
    val len = headers.getOrElse("content-length", "0").toLongOption.getOrElse(-1L)
    if (len < 0 || len > (1L << 31) - 16) return ReadMalformed
    val block = readFully(in, len.toInt)
    val warcType = headers.getOrElse("warc-type", "")
    val contentType = headers.getOrElse("content-type", "")
    // response payloads are HTTP messages: split status/headers from body,
    // then undo the transfer encodings a crawler stores verbatim —
    // chunked framing first (chunk-size lines are NOT content), then
    // Content-Encoding gzip/deflate (tolerant: a torn body keeps its raw
    // bytes rather than losing the record)
    var status = -1
    var httpCt = ""
    var body = block
    if (warcType == "response" && contentType.contains("application/http")) {
      val sep = indexOfCrlfCrlf(block)
      if (sep >= 0) {
        val head = new String(block, 0, sep, ISO_8859_1)
        val lines = head.split("\r\n")
        if (lines.nonEmpty && lines(0).startsWith("HTTP/")) {
          val parts = lines(0).split(" ")
          if (parts.length >= 2 && parts(1).forall(_.isDigit)) status = parts(1).toInt
        }
        var transferEnc = ""
        var contentEnc = ""
        lines.drop(1).foreach { l =>
          val c = l.indexOf(':')
          if (c > 0) {
            val k = l.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
            val v = l.substring(c + 1).trim
            k match {
              case "content-type" => httpCt = v
              case "transfer-encoding" => transferEnc = v.toLowerCase(java.util.Locale.ROOT)
              case "content-encoding" => contentEnc = v.toLowerCase(java.util.Locale.ROOT)
              case _ =>
            }
          }
        }
        body = java.util.Arrays.copyOfRange(block, sep + 4, block.length)
        if (transferEnc.contains("chunked")) body = dechunk(body)
        if (contentEnc.contains("gzip")) body = tryGunzip(body)
        else if (contentEnc.contains("deflate")) body = tryInflate(body)
      }
    }
    ReadOk(WarcRecord(warcType,
      headers.getOrElse("warc-target-uri", ""),
      headers.getOrElse("warc-date", ""),
      contentType, status, httpCt, body,
      payloadDigest = headers.getOrElse("warc-payload-digest", ""),
      refersToUri = headers.getOrElse("warc-refers-to-target-uri", ""),
      refersToDate = headers.getOrElse("warc-refers-to-date", "")))
  }

  /** Read a CRLF- (or bare-LF-) terminated ISO-8859-1 line; null at EOF
    * before any byte.
    */
  private def readLine(in: InputStream): String = {
    val sb = new java.io.ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (b != '\r') sb.write(b)
      b = in.read()
    }
    new String(sb.toByteArray, ISO_8859_1)
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(out, off, n - off)
      if (k < 0) throw new EOFException(s"record truncated at $off/$n")
      off += k
    }
    out
  }

  /** RFC 9112 §7.1 chunked framing: `<hex-size>[;ext]CRLF <data> CRLF`
    * repeated, `0`-size chunk ends the body (trailers ignored). Malformed
    * framing returns whatever was decoded so far plus nothing invented.
    */
  private[warc] def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    var done = false
    while (!done && i < b.length) {
      // read the size line
      var j = i
      while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
      if (j + 1 >= b.length) done = true
      else {
        val line = new String(b, i, j - i, ISO_8859_1)
        val hex = line.takeWhile(c => Character.digit(c, 16) >= 0)
        if (hex.isEmpty) done = true
        else {
          val size = try java.lang.Long.parseLong(hex, 16) catch { case _: NumberFormatException => -1L }
          if (size <= 0 || size > Int.MaxValue.toLong) done = true // 0 = terminal chunk
          else {
            val start = j + 2
            val end = math.min(b.length, start + size.toInt)
            out.write(b, start, end - start)
            i = end + 2 // skip the chunk's trailing CRLF
            if (end >= b.length) done = true
          }
        }
      }
    }
    out.toByteArray
  }

  private def tryGunzip(b: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b), 1 << 16)
      val out = new java.io.ByteArrayOutputStream(b.length * 4)
      val tmp = new Array[Byte](8192)
      var k = in.read(tmp)
      while (k >= 0) { out.write(tmp, 0, k); k = in.read(tmp) }
      out.toByteArray
    } catch { case scala.util.control.NonFatal(_) => b }

  private def tryInflate(b: Array[Byte]): Array[Byte] = {
    def run(raw: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(raw)
      try {
        inf.setInput(b)
        val out = new java.io.ByteArrayOutputStream(b.length * 4)
        val tmp = new Array[Byte](8192)
        while (!inf.finished() && !inf.needsInput()) {
          val k = inf.inflate(tmp)
          if (k == 0 && !inf.finished()) return out.toByteArray
          out.write(tmp, 0, k)
        }
        out.toByteArray
      } finally inf.end()
    }
    // "deflate" in the wild is zlib-wrapped OR raw — try both
    try { val r = run(false); if (r.nonEmpty) r else run(true) }
    catch { case scala.util.control.NonFatal(_) =>
      try run(true) catch { case scala.util.control.NonFatal(_) => b } }
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}
