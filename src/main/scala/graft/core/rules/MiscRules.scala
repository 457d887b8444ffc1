package graft.core.rules

/** The two small cosmetic/cleanup scalars the reference keeps around its
  * result handling — F13 and F19 in SURVEY §2.8. Previously dropped as
  * LLM/UI-adjacent; both are pure string functions, so they are provided
  * (and quirk-tested) for surface completeness.
  */
object MiscRules {

  /** F13 — code-fence strip (/root/reference/invoice_processor.py:750-753).
    * The reference cleans an LLM response before `json.loads`:
    * {{{
    *   if "```json" in raw: raw = raw.split("```json")[1].split("```")[0].strip()
    *   elif "```"  in raw: raw = raw.split("```")[1].split("```")[0].strip()
    * }}}
    * Python `split(sep)[1]` is the text after the FIRST separator up to the
    * next one; the following `split("```")[0]` clips at the first closing
    * fence. Replicated with indexOf (identical results, including the
    * unterminated-fence case where the remainder is kept).
    */
  def stripCodeFences(raw: String): String = {
    if (raw == null) return null
    def between(s: String, from: Int): String = {
      val e = s.indexOf("```", from)
      (if (e >= 0) s.substring(from, e) else s.substring(from)).trim
    }
    val j = raw.indexOf("```json")
    if (j >= 0) between(raw, j + "```json".length)
    else {
      val f = raw.indexOf("```")
      if (f >= 0) between(raw, f + 3)
      else raw
    }
  }

  /** F19 — human-readable file size
    * (/root/reference/static/js/main.js:formatFileSize, also app.js:682):
    * `parseFloat((bytes / k^i).toFixed(2)) + ' ' + sizes[i]` with
    * `i = floor(log(bytes)/log(1024))`. parseFloat drops the trailing
    * zeros `toFixed` adds ("1.00" → "1", "1.50" → "1.5"). The unit list
    * stops at GB exactly like the reference (uploads are capped at 1 GB,
    * app.py:15); larger inputs clamp to GB rather than reproducing JS's
    * "undefined" unit.
    */
  def humanFileSize(bytes: Long): String = {
    if (bytes == 0) return "0 Bytes"
    val sizes = Array("Bytes", "KB", "MB", "GB")
    val i = math.min(sizes.length - 1,
      math.floor(math.log(bytes.toDouble) / math.log(1024.0)).toInt)
    val v = bytes.toDouble / math.pow(1024.0, i)
    // toFixed(2) (HALF_UP at this scale); Locale.ROOT pins the '.' decimal
    // separator — the default-locale formatter emits "1,50" under e.g.
    // de_DE and the trim below (which looks for '.') never fires
    val fixed = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val trimmed =
      if (fixed.contains('.')) fixed.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      else fixed
    s"$trimmed ${sizes(i)}"
  }
}
