package graft.core.warc

import java.io.OutputStream
import java.util.zip.{CRC32, Deflater}

/** Writes one-gzip-member-per-record streams (the Common-Crawl `.warc.gz`
  * layout) while reusing a SINGLE native Deflater across members.
  *
  * `new GZIPOutputStream` per record allocates a native Deflater each time
  * and — if only `finish()`ed, never `close()`d — leaks it until GC runs
  * its Cleaner; at crawl scale (millions of records per task) that builds
  * real native-memory pressure. Hand-writing the gzip framing (RFC 1952:
  * 10-byte header, raw-deflate body, CRC32 + ISIZE trailer) lets one
  * `Deflater`/`CRC32` pair serve every member via `reset()`, with zero
  * per-record native allocation.
  *
  * Not thread-safe; one instance per writer task. `close()` releases the
  * Deflater but leaves the underlying stream open (the caller owns it).
  */
final class GzipMemberWriter(out: OutputStream) {

  private val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
  private val crc = new CRC32
  private val buf = new Array[Byte](1 << 16)

  // RFC 1952 §2.3: magic, CM=deflate, no flags, MTIME=0 (deterministic
  // output — the round-trip gate compares bytes), XFL=0, OS=255 (unknown)
  private val header = Array[Byte](0x1F, 0x8B.toByte, 8, 0, 0, 0, 0, 0, 0, 0xFF.toByte)

  /** Write the concatenation of `chunks` as ONE gzip member. */
  def writeMember(chunks: Array[Byte]*): Unit = {
    out.write(header)
    deflater.reset()
    crc.reset()
    var total = 0L
    chunks.foreach { c =>
      crc.update(c)
      total += c.length
      deflater.setInput(c)
      drain(finishing = false)
    }
    deflater.finish()
    drain(finishing = true)
    writeIntLE(crc.getValue.toInt)
    writeIntLE((total & 0xFFFFFFFFL).toInt)
  }

  private def drain(finishing: Boolean): Unit = {
    var n = 0
    do {
      n = deflater.deflate(buf)
      if (n > 0) out.write(buf, 0, n)
    } while (n > 0 || (finishing && !deflater.finished()))
  }

  private def writeIntLE(v: Int): Unit = {
    out.write(v & 0xFF)
    out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF)
    out.write((v >>> 24) & 0xFF)
  }

  /** Release the native Deflater. Does NOT close the underlying stream. */
  def close(): Unit = deflater.end()
}
