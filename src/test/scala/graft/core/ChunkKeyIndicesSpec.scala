package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The `indices` addressing mode, ported from the reference's Key tests
  * (core_test.py:50-59, 88-112, 139-166). */
class ChunkKeyIndicesSpec extends AnyFunSuite {

  test("construction and mutual exclusion (core_test.py:50-59)") {
    val key = ChunkKey.atIndices("x" -> 0L, "y" -> 1L)
    assert(key.indices == Map("x" -> 0L, "y" -> 1L) && key.offsets.isEmpty)
    val e = intercept[IllegalArgumentException](
      ChunkKey(Map("x" -> 0L), None, Map("x" -> 0L)))
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("withIndices insert / override / remove (core_test.py:145-166)") {
    val key = ChunkKey.atIndices("x" -> 0L)
    assert(key.withIndices("x" -> 1L) == ChunkKey.atIndices("x" -> 1L))
    assert(key.withIndices("y" -> 1L) ==
      ChunkKey.atIndices("x" -> 0L, "y" -> 1L))
    assert(key.withIndices("x" -> -1L) == ChunkKey(Map.empty[String, Long], None))
    assert(key.withIndices("x" -> -1L, "y" -> 1L, "z" -> 2L) ==
      ChunkKey.atIndices("y" -> 1L, "z" -> 2L))
    // vars ride along untouched
    val kv = ChunkKey(Map.empty[String, Long], Some(Seq("foo")), Map("x" -> 0L))
    assert(kv.withIndices("x" -> 5L).vars.contains(Seq("foo")))
  }

  test("cross-mode mutation is rejected (core_test.py:139-144, 193-194)") {
    val ki = ChunkKey.atIndices("x" -> 0L)
    val e1 = intercept[IllegalArgumentException](ki.withOffsets("x" -> 1L))
    assert(e1.getMessage.contains("cannot call withOffsets"))
    val ko = ChunkKey("x" -> 0L)
    val e2 = intercept[IllegalArgumentException](ko.withIndices("x" -> 1L))
    assert(e2.getMessage.contains("cannot call withIndices"))
  }

  test("offsets <-> indices round-trip against a chunk grid (core.py:77-80)") {
    val chunks = Map("x" -> 100, "y" -> 8)
    val ko = ChunkKey(Map("x" -> 400L, "y" -> 16L), Some(Seq("foo")))
    val ki = ko.toIndices(chunks)
    assert(ki == ChunkKey(Map.empty[String, Long], Some(Seq("foo")),
      Map("x" -> 4L, "y" -> 2L)))
    assert(ki.toOffsets(chunks) == ko)
    // whole-grid sweep: every enumerated key survives the round trip
    val dims = Seq("t" -> 10L, "x" -> 7L)
    val grid = Map("t" -> 3, "x" -> 4)
    ChunkGrid.iterChunkKeys(Seq("t", "x"), grid, dims.toMap).foreach { k =>
      assert(k.toIndices(grid).toOffsets(grid) == k)
    }
  }

  test("misaligned offset has no chunk index") {
    val e = intercept[IllegalArgumentException](
      ChunkKey("x" -> 150L).toIndices(Map("x" -> 100)))
    assert(e.getMessage.contains("not aligned"))
  }

  test("canonical encodings of the two modes never collide") {
    val ko = ChunkKey("x" -> 4L)
    val ki = ChunkKey.atIndices("x" -> 4L)
    assert(ko.canonical != ki.canonical)
    assert(ki.canonical.startsWith("indices["))
  }
}
