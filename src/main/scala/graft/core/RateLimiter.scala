package graft.core

/** C6 — the reference's sliding-window rate limiter
  * (/root/reference/invoice_processor.py:37-118), re-derived with its
  * exact thresholds. The reference throttles Gemini API calls; this
  * engine has no external API, so the class is the generic
  * ingestion-throttle primitive (e.g. pacing fetches against an origin)
  * with the clock, sleeper, and jitter injected so behavior is
  * deterministic and unit-testable.
  *
  * Semantics kept 1:1:
  *  - sliding window: calls older than `windowSizeSec` are evicted before
  *    each decision (:48-51 of the reference's `wait_if_needed`);
  *  - throttle when forced, when fewer than 3 calls remain, or at ≥80%
  *    window utilization (:57);
  *  - wait = `currentWaitTime × jitter(0.8..1.2)`, floored at 25% of the
  *    window when ≤1 call remains (:59-64);
  *  - `setBatchSize` picks 1.2× (spread out) or 0.8× (minimal buffer) of
  *    the per-call period (:52-62 of the class).
  *
  * Not thread-per-lock like the Python original: callers in a Spark job
  * hold one limiter per task/partition, so no shared-state lock is
  * needed; the deque logic is identical.
  */
final class RateLimiter(
    maxCallsPerMin: Int = 15,
    windowSizeSec: Double = 60.0,
    clock: () => Double = () => System.nanoTime() / 1e9,
    sleeper: Double => Unit = s => Thread.sleep((s * 1000).toLong),
    jitter: () => Double = () => 1.0) {

  private val calls = scala.collection.mutable.Queue.empty[Double]
  private var currentWaitTime: Double = 0.0
  private var batchSize: Int = 1

  def setBatchSize(b: Int): Unit = {
    batchSize = math.max(1, b)
    currentWaitTime =
      if (batchSize > maxCallsPerMin) (windowSizeSec / maxCallsPerMin) * 1.2
      else (windowSizeSec / maxCallsPerMin) * 0.8
  }

  /** @return true if a wait was performed. */
  def waitIfNeeded(forceWait: Boolean = false): Boolean = {
    val now = clock()
    while (calls.nonEmpty && now - calls.head > windowSizeSec) calls.dequeue()
    val callCount = calls.length
    val remaining = maxCallsPerMin - callCount
    if (forceWait || remaining < 3 || callCount >= maxCallsPerMin * 0.8) {
      var waitTime = currentWaitTime * jitter()
      if (remaining <= 1) waitTime = math.max(waitTime, windowSizeSec * 0.25)
      sleeper(waitTime)
      true
    } else false
  }

  def addCall(): Unit = calls.enqueue(clock())

  /** Window utilization in [0,1] (reference `get_utilization`). */
  def utilization: Double = {
    val now = clock()
    while (calls.nonEmpty && now - calls.head > windowSizeSec) calls.dequeue()
    calls.length.toDouble / maxCallsPerMin
  }
}
