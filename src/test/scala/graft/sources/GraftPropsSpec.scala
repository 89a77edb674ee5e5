package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract for the driver→executor `graft.*` property transport
  * (the integration proof is the multi-JVM s3 gates; this pins the
  * snapshot/restore semantics directly). */
class GraftPropsSpec extends AnyFunSuite {

  test("snapshot captures only graft.* keys; restore overwrites and is idempotent") {
    val k1 = "graft.test.propsSpecA"
    val k2 = "graft.test.propsSpecB"
    val other = "nongraft.test.propsSpec"
    try {
      sys.props(k1) = "v1"
      sys.props(other) = "x"
      val snap = GraftProps.snapshot()
      assert(snap.get(k1).contains("v1"))
      assert(!snap.contains(other), "non-graft keys must not be captured")

      // a later snapshot (rotation) must overwrite what restore set
      sys.props(k1) = "v2"
      sys.props(k2) = "w1"
      val snap2 = GraftProps.snapshot()

      // simulate the executor: stale value from the first snapshot
      sys.props(k1) = "v1"
      sys.props.remove(k2)
      GraftProps.restore(snap2)
      assert(sys.props(k1) == "v2", "rotation must propagate (overwrite)")
      assert(sys.props(k2) == "w1", "new keys must land")
      GraftProps.restore(snap2) // idempotent
      assert(sys.props(k1) == "v2" && sys.props(k2) == "w1")
    } finally {
      sys.props.remove(k1); sys.props.remove(k2); sys.props.remove(other)
    }
  }
}
