package graft.core.warc

import java.io.{BufferedInputStream, InputStream, PushbackInputStream}
import java.util.zip.Inflater

/** One gzip member of a multi-member stream: where it starts in the file,
  * how many compressed bytes it spans, and its decompressed content.
  * `(offset, compressedLength)` is exactly what a CDX index records — a
  * reader can later `seek(offset)`, read `compressedLength` bytes, and
  * gunzip one record without touching the rest of the segment.
  */
final case class GzipMember(offset: Long, compressedLength: Long, bytes: Array[Byte])

/** Member-boundary scanner for per-record-gzip streams (the Common Crawl
  * `.warc.gz` layout). `GZIPInputStream` reads multi-member streams but
  * HIDES the boundaries; indexing a segment needs them, so this parses the
  * RFC 1952 framing itself: fixed header, optional FEXTRA/FNAME/FCOMMENT/
  * FHCRC fields (foreign writers set them; [[GzipMemberWriter]] does not),
  * raw-deflate body via `Inflater(nowrap)`, 8-byte CRC/ISIZE trailer.
  * Compressed length is tracked by position accounting: bytes the Inflater
  * over-read past the deflate stream are pushed back for the next member.
  *
  * Torn tails (truncated final member, junk after the last trailer) end
  * iteration instead of throwing — same contract as [[WarcReader]].
  */
object GzipMembers {

  def members(raw: InputStream): Iterator[GzipMember] = new Iterator[GzipMember] {
    // pushback must cover one full input chunk: after the deflate stream
    // ends mid-chunk, the unconsumed remainder is returned to the stream
    private val in = new PushbackInputStream(new BufferedInputStream(raw, 1 << 16), ChunkSize)
    private var pos = 0L
    private var nextM: GzipMember = null
    private var done = false

    private def advance(): Unit = {
      if (nextM == null && !done) {
        try {
          nextM = readMember(in, pos)
          if (nextM == null) done = true else pos = nextM.offset + nextM.compressedLength
        } catch {
          case scala.util.control.NonFatal(_) => done = true // torn tail
        }
      }
    }
    def hasNext: Boolean = { advance(); !done }
    def next(): GzipMember = {
      advance()
      if (done) throw new NoSuchElementException("gzip stream exhausted")
      val m = nextM; nextM = null; m
    }
  }

  private val ChunkSize = 1 << 16

  /** Parse one member starting at `start`; null at clean EOF. Throws on a
    * malformed header or truncated body (caller treats it as a torn tail).
    */
  private def readMember(in: PushbackInputStream, start: Long): GzipMember = {
    var pos = start
    def read1(): Int = { val b = in.read(); if (b >= 0) pos += 1; b }
    def skipN(n: Int): Unit = {
      var i = 0
      while (i < n) { if (read1() < 0) throw new java.io.EOFException("gzip header truncated"); i += 1 }
    }
    def skipZeroTerminated(): Unit = {
      var b = read1()
      while (b > 0) b = read1()
      if (b < 0) throw new java.io.EOFException("gzip header truncated")
    }

    val id1 = read1()
    if (id1 < 0) return null // clean EOF at a member boundary
    val id2 = read1()
    val cm = read1()
    val flg = read1()
    if (id1 != 0x1F || id2 != 0x8B || cm != 8 || flg < 0)
      throw new java.util.zip.ZipException(f"not a gzip member at $start%d")
    skipN(6) // MTIME(4) XFL OS
    if ((flg & 0x04) != 0) { // FEXTRA
      val lo = read1(); val hi = read1()
      if (lo < 0 || hi < 0) throw new java.io.EOFException("gzip header truncated")
      skipN(lo | (hi << 8))
    }
    if ((flg & 0x08) != 0) skipZeroTerminated() // FNAME
    if ((flg & 0x10) != 0) skipZeroTerminated() // FCOMMENT
    if ((flg & 0x02) != 0) skipN(2) // FHCRC

    val inf = new Inflater(/*nowrap=*/ true)
    val out = new java.io.ByteArrayOutputStream(ChunkSize)
    val chunk = new Array[Byte](ChunkSize)
    val dec = new Array[Byte](ChunkSize)
    try {
      var lastK = 0
      while (!inf.finished()) {
        if (inf.needsInput()) {
          val k = in.read(chunk)
          if (k < 0) throw new java.io.EOFException("deflate stream truncated")
          pos += k
          lastK = k
          inf.setInput(chunk, 0, k)
        }
        val n = inf.inflate(dec)
        if (n > 0) out.write(dec, 0, n)
        else if (n == 0 && !inf.finished() && !inf.needsInput())
          throw new java.util.zip.ZipException("deflate stalled")
      }
      // bytes of the last chunk beyond the deflate stream belong to the
      // trailer and the NEXT member — return them
      val rem = inf.getRemaining
      if (rem > 0) {
        in.unread(chunk, lastK - rem, rem)
        pos -= rem
      }
      skipN(8) // CRC32 + ISIZE (framing only; content integrity is the caller's gate)
      GzipMember(start, pos - start, out.toByteArray)
    } finally inf.end()
  }
}
