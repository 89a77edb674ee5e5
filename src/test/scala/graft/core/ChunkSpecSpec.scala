package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's normalize_chunks tests
  * (dataset_test.py:54-215) against normalizeChunkSpecs. */
class ChunkSpecSpec extends AnyFunSuite {

  private def norm(specs: Map[String, ChunkSpec], dims: Seq[(String, Long)],
                   itemsize: Long, default: Option[ChunkSpec] = None,
                   prev: Map[String, Int] = Map.empty): Map[String, Int] =
    ChunkGrid.normalizeChunkSpecs(specs, dims.toMap, dims.map(_._1),
      itemsize, default, prev)

  test("parse byte strings: decimal and binary units") {
    assert(ChunkSpec.parse("80B").bytes == 80L)
    assert(ChunkSpec.parse("1KiB").bytes == 1024L)
    assert(ChunkSpec.parse("64KiB").bytes == 65536L)
    assert(ChunkSpec.parse("100MB").bytes == 100000000L)
    assert(ChunkSpec.parse("128MiB").bytes == 128L * 1024 * 1024)
    assert(ChunkSpec.parse("1GB").bytes == 1000000000L)
    assertThrows[IllegalArgumentException](ChunkSpec.parse("auto"))
    assertThrows[IllegalArgumentException](ChunkSpec.parse("12"))
  }

  test("minus one / Full: full dim (dataset_test.py:54-62)") {
    val dims = Seq("x" -> 20L, "y" -> 30L)
    assert(norm(Map.empty, dims, 8, default = Some(ChunkSpec.Full)) ==
      Map("x" -> 20, "y" -> 30))
    assert(norm(Map("x" -> ChunkSpec.Full), dims, 8) ==
      Map("x" -> 20, "y" -> 30))
  }

  test("int chunks, missing dim defaults to full (dataset_test.py:64-76)") {
    assert(norm(Map("x" -> ChunkSpec.Elems(5)), Seq("x" -> 10L), 8) ==
      Map("x" -> 5))
    assert(norm(Map("x" -> ChunkSpec.Elems(5)), Seq("x" -> 10L, "y" -> 2L), 8) ==
      Map("x" -> 5, "y" -> 2))
  }

  test("byte target with previous chunks snaps to multiples (dataset_test.py:78-86)") {
    assert(norm(Map.empty, Seq("x" -> 5L, "y" -> 4L), 8,
      default = Some(ChunkSpec.parse("80B")), prev = Map("x" -> 5, "y" -> 1)) ==
      Map("x" -> 5, "y" -> 2))
  }

  test("large byte limit on small array does not chunk (dataset_test.py:87-94)") {
    assert(norm(Map.empty, Seq("x" -> 10L), 8,
      default = Some(ChunkSpec.parse("128MiB"))) == Map("x" -> 10))
  }

  test("byte target on one large dim (dataset_test.py:115-121)") {
    assert(norm(Map.empty, Seq("x" -> (1L << 20)), 8,
      default = Some(ChunkSpec.parse("64KiB"))) == Map("x" -> 8192))
  }

  test("byte target split evenly across two dims (dataset_test.py:123-133)") {
    assert(norm(Map.empty, Seq("x" -> 100L, "y" -> 100L), 1,
      default = Some(ChunkSpec.parse("1KiB"))) == Map("x" -> 32, "y" -> 32))
  }

  test("combined itemsize: sum across vars vs max when split (dataset_test.py:135-153)") {
    import graft.ndarray.DType
    val both = Template(Seq("x" -> 8192L),
      Map("foo" -> VarSpec(Seq("x"), DType.F64), "bar" -> VarSpec(Seq("x"), DType.F64)),
      Map.empty, Map.empty)
    assert(both.combinedItemsize(splitVars = false) == 16L)
    assert(norm(Map.empty, Seq("x" -> 8192L), both.combinedItemsize(false),
      default = Some(ChunkSpec.parse("64KiB"))) == Map("x" -> 4096))
    val mixed = Template(Seq("x" -> 8192L),
      Map("foo" -> VarSpec(Seq("x"), DType.F64), "bar" -> VarSpec(Seq("x"), DType.I32)),
      Map.empty, Map.empty)
    assert(mixed.combinedItemsize(splitVars = true) == 8L)
    assert(norm(Map.empty, Seq("x" -> 8192L), mixed.combinedItemsize(true),
      default = Some(ChunkSpec.parse("32KiB"))) == Map("x" -> 4096))
  }

  test("empty specs default to previous chunks or full (dataset_test.py:155-169)") {
    assert(norm(Map.empty, Seq("x" -> 10L), 8) == Map("x" -> 10))
    assert(norm(Map.empty, Seq("x" -> 10L), 8, prev = Map("x" -> 5)) ==
      Map("x" -> 5))
  }

  test("chunk larger than dim clamps (dataset_test.py:171-178)") {
    assert(norm(Map("x" -> ChunkSpec.Elems(100)), Seq("x" -> 10L), 8) ==
      Map("x" -> 10))
  }

  test("aspect ratio follows previous chunks (dataset_test.py:180-189)") {
    assert(norm(Map.empty, Seq("x" -> 100L, "y" -> 100L), 8,
      default = Some(ChunkSpec.parse(s"${20 * 50 * 8}B")),
      prev = Map("x" -> 10, "y" -> 25)) == Map("x" -> 20, "y" -> 50))
  }

  test("multiple distinct byte targets rejected (dataset_test.py:191-203)") {
    assertThrows[IllegalArgumentException] {
      norm(Map("x" -> ChunkSpec.parse("1KiB"), "y" -> ChunkSpec.parse("2KiB")),
        Seq("x" -> 10L, "y" -> 10L), 8)
    }
    // equal byte targets on two dims are fine
    assert(norm(Map("x" -> ChunkSpec.parse("1KiB"), "y" -> ChunkSpec.parse("1KiB")),
      Seq("x" -> 100L, "y" -> 100L), 1) == Map("x" -> 32, "y" -> 32))
  }

  test("empty dataset, empty chunks (dataset_test.py:205-208)") {
    assert(norm(Map.empty, Seq.empty, 1) == Map.empty)
  }
}
