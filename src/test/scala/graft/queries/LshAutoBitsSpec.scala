package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[VectorOps.autoLshBits]] sizing rule — the default that
  * keeps LSH bucket-join candidate work (Σ n_b² ≈ n²/2^bits) flat as
  * the corpus grows. The specific pins reproduce the two measured
  * configurations: e03's 4-bit plan at the sf0.1 corpus (n=2000) and
  * e17's 8-bit plan at the 10× corpus (n=20000), so an auto-sized
  * pipeline (e18) matches e17's plan at 10× scale by construction. */
class LshAutoBitsSpec extends AnyFunSuite {
  import VectorOps.autoLshBits

  test("reproduces the measured e03/e17 bit choices") {
    assert(autoLshBits(2000) == 4)   // sf0.1 corpus → e03's plan
    assert(autoLshBits(20000) == 8)  // 10× corpus → e17's plan
    assert(autoLshBits(500) == 2)    // sf0.01/sf0.001 corpus
  }

  test("integer rule: smallest b with targetPop·2^b >= n, no log2 hazard") {
    // exact power-of-two boundaries must not flip on float rounding
    assert(autoLshBits(128 * 16) == 4)     // 2048: exactly fills 16 buckets
    assert(autoLshBits(128 * 16 + 1) == 5) // one more vector → next bit
    assert(autoLshBits(0) == 1)
    assert(autoLshBits(1) == 1)
    assert(autoLshBits(257, targetPop = 1) == 9)
    // monotone non-decreasing in n
    val bs = (1L to 20).map(k => autoLshBits(1L << k))
    assert(bs == bs.sorted)
  }

  test("clamps: maxBits caps the answer; a 10^9 corpus asks for 23 bits") {
    assert(autoLshBits(1000000000L) == 23)
    assert(autoLshBits(1000000000L, maxBits = 8) == 8)
    assert(autoLshBits(20000, maxBits = 8) == 8)
    assertThrows[IllegalArgumentException](autoLshBits(-1))
    assertThrows[IllegalArgumentException](autoLshBits(10, targetPop = 0))
  }
}
