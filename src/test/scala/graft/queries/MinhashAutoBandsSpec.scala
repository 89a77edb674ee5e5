package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[TextOps.autoMinhashBands]] sizing rule — (bands, rows)
  * from a target Jaccard threshold, the MinHash analogue of
  * [[VectorOps.autoLshBits]]. The S-curve midpoint (1/b)^(1/r) is the
  * similarity the banding targets; the rule picks the divisor pair of
  * the lane count closest to it. */
class MinhashAutoBandsSpec extends AnyFunSuite {
  import TextOps.autoMinhashBands

  test("reproduces d04's fixed table and d11's choice") {
    // d04's hardcoded 4 bands x 2 rows over 8 lanes IS the rule at
    // t=0.5: (1/4)^(1/2) = 0.5 exactly
    assert(autoMinhashBands(8, 0.5) == (4, 2))
    // d11: 16 lanes at t=0.7 -> 4x4, midpoint (1/4)^(1/4) = 0.707
    assert(autoMinhashBands(16, 0.7) == (4, 4))
  }

  test("threshold monotonicity: higher targets get fewer bands") {
    // more bands = lower S-curve midpoint = looser matching; as the
    // target rises the chosen band count must not increase
    val ts = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
    val bs = ts.map(t => autoMinhashBands(16, t)._1)
    assert(bs == bs.sorted.reverse, s"bands not antitone in t: $bs")
    assert(autoMinhashBands(16, 0.95) == (2, 8) ||
      autoMinhashBands(16, 0.95) == (1, 16)) // near-1 target: 1-2 bands
    assert(autoMinhashBands(16, 0.1)._1 >= 8) // loose target: many bands
  }

  test("pairs always multiply back to the lane count; ties favor fewer bands") {
    for (h <- Seq(4, 8, 12, 16, 64); t <- Seq(0.2, 0.5, 0.8)) {
      val (b, r) = autoMinhashBands(h, t)
      assert(b * r == h, s"h=$h t=$t gave ($b,$r)")
      assert(b >= 1 && r >= 1)
    }
    assertThrows[IllegalArgumentException](autoMinhashBands(0, 0.5))
    assertThrows[IllegalArgumentException](autoMinhashBands(8, 0.0))
    assertThrows[IllegalArgumentException](autoMinhashBands(8, 1.0))
  }
}
