package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.rules.MiscRules

/** F13 / F19 / C6 — the previously-dropped small pieces, now implemented
  * with the reference's exact semantics.
  */
class MiscSpec extends AnyFunSuite {

  // ---- F13: code-fence strip (invoice_processor.py:750-753) ------------

  test("```json fence extracts the fenced payload") {
    assert(MiscRules.stripCodeFences("noise ```json\n{\"a\": 1}\n``` trailing")
      == "{\"a\": 1}")
  }

  test("bare ``` fence used only when no ```json fence exists") {
    assert(MiscRules.stripCodeFences("x ``` {\"b\":2} ``` y") == "{\"b\":2}")
  }

  test("no fences: input passes through unchanged") {
    val s = "{\"c\": 3} plain"
    assert(MiscRules.stripCodeFences(s) eq s)
  }

  test("unterminated fence keeps the remainder (python split()[1] behavior)") {
    assert(MiscRules.stripCodeFences("pre ```json {\"d\":4}") == "{\"d\":4}")
    assert(MiscRules.stripCodeFences("pre ``` tail only") == "tail only")
  }

  test("second ```json occurrence clips like python split (prefix ``` match)") {
    // python: split("```json")[1] == " a ", then split("```")[0] == " a "
    assert(MiscRules.stripCodeFences("x ```json a ```json b ``` c") == "a")
  }

  // ---- F19: human file size (main.js formatFileSize) -------------------

  test("file sizes format like the reference's JS (trailing zeros dropped)") {
    assert(MiscRules.humanFileSize(0L) == "0 Bytes")
    assert(MiscRules.humanFileSize(123L) == "123 Bytes")
    assert(MiscRules.humanFileSize(1023L) == "1023 Bytes")
    assert(MiscRules.humanFileSize(1024L) == "1 KB")
    assert(MiscRules.humanFileSize(1536L) == "1.5 KB")
    assert(MiscRules.humanFileSize(1126L) == "1.1 KB")
    assert(MiscRules.humanFileSize(1048576L) == "1 MB")
    assert(MiscRules.humanFileSize(2621440L) == "2.5 MB")
    assert(MiscRules.humanFileSize(1073741824L) == "1 GB")
  }

  test("file sizes are locale-independent (comma-decimal default locale)") {
    // a de_DE default locale formats 1.5 as "1,50"; the trailing-zero trim
    // looks for '.' so the UDF would silently emit "1,50 KB" on such an
    // executor unless the formatter pins Locale.ROOT
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(MiscRules.humanFileSize(1536L) == "1.5 KB")
      assert(MiscRules.humanFileSize(1126L) == "1.1 KB")
      assert(MiscRules.humanFileSize(1048576L) == "1 MB")
    } finally java.util.Locale.setDefault(saved)
  }

  // ---- C6: rate limiter (invoice_processor.py:37-118) ------------------

  test("rate limiter throttles at 80% utilization and floors near the cap") {
    var now = 0.0
    val waits = scala.collection.mutable.ArrayBuffer.empty[Double]
    val rl = new RateLimiter(maxCallsPerMin = 15, windowSizeSec = 60.0,
      clock = () => now, sleeper = w => waits += w)
    rl.setBatchSize(1) // currentWaitTime = (60/15) * 0.8 = 3.2

    // below both thresholds: no waits through the 12th check
    (0 until 12).foreach { k =>
      assert(!rl.waitIfNeeded(), s"unexpected wait at callCount=$k")
      rl.addCall(); now += 0.1
    }
    // callCount=12 == 80% of 15 → throttle at the batch-size wait time
    assert(rl.waitIfNeeded())
    assert(math.abs(waits.last - 3.2) < 1e-9)

    // at <=1 remaining the wait floors to 25% of the window
    rl.addCall(); rl.addCall() // callCount = 14, remaining = 1
    assert(rl.waitIfNeeded())
    assert(waits.last >= 15.0)

    // window slides: everything evicted after windowSizeSec
    now += 61.0
    assert(!rl.waitIfNeeded())
    assert(rl.utilization == 0.0)
  }

  test("batch size adjusts the wait period exactly like the reference") {
    var now = 0.0
    val waits = scala.collection.mutable.ArrayBuffer.empty[Double]
    val rl = new RateLimiter(maxCallsPerMin = 15, windowSizeSec = 60.0,
      clock = () => now, sleeper = w => waits += w)
    rl.setBatchSize(30) // > max/min → (60/15) * 1.2 = 4.8
    assert(rl.waitIfNeeded(forceWait = true))
    assert(math.abs(waits.last - 4.8) < 1e-9)
    // jitter multiplies the wait (injected; reference uses uniform 0.8..1.2)
    val rlj = new RateLimiter(15, 60.0, () => now, w => waits += w, () => 0.8)
    rlj.setBatchSize(30)
    rlj.waitIfNeeded(forceWait = true)
    assert(math.abs(waits.last - 4.8 * 0.8) < 1e-9)
  }

  test("utilization tracks the sliding window") {
    var now = 0.0
    val rl = new RateLimiter(15, 60.0, () => now, _ => ())
    (0 until 5).foreach { _ => rl.addCall(); now += 1 }
    assert(math.abs(rl.utilization - 5.0 / 15) < 1e-9)
    now += 60
    assert(rl.utilization == 0.0)
  }
}
