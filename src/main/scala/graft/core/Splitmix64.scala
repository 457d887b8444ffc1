package graft.core

/** Deterministic splittable RNG (splitmix64, public domain algorithm by
  * Sebastiano Vigna). Every random choice in fixture/page generation is a
  * pure function of (seed, index) — no wall clock, no shared state — so the
  * pages table is byte-identical across runs and parallelism levels.
  */
object Splitmix64 {
  /** One splitmix64 scramble step. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Stateless stream: value i of the stream seeded by `seed`. */
  def at(seed: Long, i: Long): Long = mix(seed + i * 0x9e3779b97f4a7c15L)

  /** Uniform int in [0, bound) from a raw 64-bit value. */
  def bounded(raw: Long, bound: Int): Int = {
    val r = raw >>> 1 // non-negative
    (r % bound).toInt
  }

  /** Uniform double in [0, 1). */
  def toDouble(raw: Long): Double = (raw >>> 11) * 1.1102230246251565e-16
}
