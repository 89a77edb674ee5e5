package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.core.ChunkKey

/** Ports of the reference's fanout planner tests
  * (combiners_test.py:29-125). */
class FanoutPlannerSpec extends AnyFunSuite {

  test("indexToFanoutBins (combiners_test.py:73-74)") {
    assert(FanoutPlanner.indexToFanoutBins(0, Vector(2, 2)) == Vector(0L, 0L))
    assert(FanoutPlanner.indexToFanoutBins(1, Vector(2, 2)) == Vector(1L, 0L))
    assert(FanoutPlanner.indexToFanoutBins(2, Vector(2, 2)) == Vector(0L, 1L))
    assert(FanoutPlanner.indexToFanoutBins(3, Vector(2, 2)) == Vector(1L, 1L))
    assert(FanoutPlanner.indexToFanoutBins(4, Vector(2, 2)) == Vector(0L, 0L))
  }

  test("completeFanoutBins prefers higher fanout earlier (combiners.py:219-232)") {
    assert(FanoutPlanner.completeFanoutBins(4, 2, 16) == Vector(4, 4))
    assert(FanoutPlanner.completeFanoutBins(4, 2, 12) == Vector(4, 3))
    assert(FanoutPlanner.completeFanoutBins(4, 2, 10) == Vector(4, 3))
    assert(FanoutPlanner.completeFanoutBins(4, 2, 9) == Vector(3, 3))
  }

  test("optimalFanoutBins matches reference expectations (combiners_test.py:78-125)") {
    assert(FanoutPlanner.optimalFanoutBins(
      Seq("x"), Map("x" -> 1000000), Map("x" -> 1000000L), 4) == Vector.empty)
    assert(FanoutPlanner.optimalFanoutBins(
      Seq("x"), Map("x" -> 10000), Map("x" -> 1000000L), 4) == Vector(100))
    assert(FanoutPlanner.optimalFanoutBins(
      Seq("x"), Map("x" -> 1000), Map("x" -> 1000000L), 4) == Vector(32, 32))
    assert(FanoutPlanner.optimalFanoutBins(
      Seq("time"), Map("time" -> 100, "x" -> 1000, "y" -> 1000),
      Map("time" -> 100000L, "x" -> 1000L, "y" -> 1000L), 4) ==
      Vector(4, 4, 4, 4, 4))
    assert(FanoutPlanner.optimalFanoutBins(
      Seq("time"), Map("time" -> 100, "y" -> 1000, "z" -> 1000),
      Map("time" -> 500L, "x" -> 1000L, "y" -> 1000L), 4) == Vector(5))
    assert(FanoutPlanner.optimalFanoutBins(
      Seq("time", "x", "y"), Map("time" -> 100, "x" -> 1000, "y" -> 1000),
      Map("time" -> 100000L, "x" -> 1000L, "y" -> 1000L), 4) == Vector(32, 32))
  }

  test("chunkIndex is row-major over dims (combiners.py:190-202)") {
    val chunks = Map("t" -> 10, "x" -> 10)
    val sizes = Map("t" -> 30L, "x" -> 20L)
    assert(FanoutPlanner.chunkIndex(ChunkKey("t" -> 0L, "x" -> 0L),
      Seq("t", "x"), chunks, sizes) == 0L)
    assert(FanoutPlanner.chunkIndex(ChunkKey("t" -> 0L, "x" -> 10L),
      Seq("t", "x"), chunks, sizes) == 1L)
    assert(FanoutPlanner.chunkIndex(ChunkKey("t" -> 10L, "x" -> 0L),
      Seq("t", "x"), chunks, sizes) == 2L)
    assert(FanoutPlanner.chunkIndex(ChunkKey("t" -> 20L, "x" -> 10L),
      Seq("t", "x"), chunks, sizes) == 5L)
  }
}
