package graft.util

/** Splittable, stateless PRNG utilities (SplitMix64 / Stafford mix).
  *
  * Every synthetic byte in this engine is derived from `(seed, partition,
  * offset, field)` through these mixers — no shared `Random` state, no wall
  * clock — so generation is deterministic, order-independent and
  * parallelizable across executors (FIXTURES.md F1).
  */
object Rng {
  /** SplitMix64 finalizer (public domain, Steele et al., JDK SplittableRandom). */
  @inline def mix64(zIn: Long): Long = {
    var z = zIn + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Combine components into one 64-bit stream key. */
  @inline def key(parts: Long*): Long = {
    var h = 0x51_7c_c1_b7_27_22_0a_95L
    var i = 0
    while (i < parts.length) { h = mix64(h ^ parts(i)); i += 1 }
    h
  }

  /** Uniform double in [0, 1) from a key. */
  @inline def uniform(k: Long): Double =
    (mix64(k) >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** Uniform int in [0, n) from a key. */
  @inline def nextInt(k: Long, n: Int): Int = {
    require(n > 0)
    ((mix64(k) >>> 33) % n).toInt
  }

  /** Zipf-like rank sampler: returns rank in [0, n) with P(r) ~ 1/(r+1)^s.
    * Uses inverse-CDF over precomputed cumulative weights for small n. */
  final class Zipf(n: Int, s: Double) extends Serializable {
    private val cdf: Array[Double] = {
      val w = Array.tabulate(n)(i => 1.0 / math.pow(i + 1.0, s))
      val total = w.sum
      val c = new Array[Double](n)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += w(i) / total; c(i) = acc; i += 1 }
      c(n - 1) = 1.0
      c
    }
    def sample(k: Long): Int = {
      val u = uniform(k)
      val idx = java.util.Arrays.binarySearch(cdf, u)
      if (idx >= 0) idx else math.min(n - 1, -idx - 1)
    }
  }
}
