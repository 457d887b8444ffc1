package graft.core

/** 48-bit SimHash over single-space word tokens — the document-level
  * signature q49 computes. Exact-parity contract (pinned by tests and the
  * DuckDB oracle): tokens = `split(text, " ", -1)` (Spark `split` keeps
  * empty tokens), per-token hash = first 12 hex chars of md5 parsed
  * big-endian (= `conv(substr(md5(x),1,12),16,10)`), bit j of the
  * signature set iff the ±1 vote sum over tokens is > 0.
  *
  * One pass per document; replaces an explode → 48-conditional-sum
  * aggregate shape (2 shuffles, 48 agg columns) with a scalar projection.
  */
object SimHashCore {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def simhash48(text: String): Long = {
    val md = mdLocal.get()
    val sums = new Array[Int](48)
    var from = 0
    val n = text.length
    // manual single-space tokenizer == split(" ", -1) incl. empty tokens
    while (from <= n) {
      var to = text.indexOf(' ', from)
      if (to < 0) to = n
      md.reset()
      md.update(text.substring(from, to).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val dig = md.digest()
      var h = 0L
      var b = 0
      while (b < 6) { h = (h << 8) | (dig(b) & 0xFFL); b += 1 }
      var j = 0
      while (j < 48) {
        if (((h >> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      from = to + 1
    }
    var sh = 0L
    var j = 0
    while (j < 48) { if (sums(j) > 0) sh |= 1L << j; j += 1 }
    sh
  }
}
