package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ChunkGridSpec extends AnyFunSuite {

  val dims = Map("t" -> 10L, "x" -> 6L)

  test("normalizeChunks: -1/missing = full dim, clamp to size") {
    assert(ChunkGrid.normalizeChunks(Map("t" -> 3), dims) ==
      Map("t" -> 3, "x" -> 6))
    assert(ChunkGrid.normalizeChunks(Map("t" -> -1, "x" -> 100), dims) ==
      Map("t" -> 10, "x" -> 6))
    assertThrows[IllegalArgumentException] {
      ChunkGrid.normalizeChunks(Map("bogus" -> 2), dims)
    }
    assertThrows[IllegalArgumentException] {
      ChunkGrid.normalizeChunks(Map("t" -> 0), dims)
    }
  }

  test("chunkCounts/totalChunks use ceiling division (uneven last chunk)") {
    val chunks = Map("t" -> 3, "x" -> 4)
    assert(ChunkGrid.chunkCounts(chunks, dims) == Map("t" -> 4L, "x" -> 2L))
    assert(ChunkGrid.totalChunks(chunks, dims) == 8L)
  }

  test("keyForIndex enumerates row-major and matches iterChunkKeys") {
    val chunks = Map("t" -> 3, "x" -> 4)
    val keys = ChunkGrid.iterChunkKeys(Seq("t", "x"), chunks, dims).toSeq
    assert(keys.length == 8)
    assert(keys.head == ChunkKey("t" -> 0L, "x" -> 0L))
    assert(keys(1) == ChunkKey("t" -> 0L, "x" -> 4L))
    assert(keys(2) == ChunkKey("t" -> 3L, "x" -> 0L))
    assert(keys.last == ChunkKey("t" -> 9L, "x" -> 4L))
    keys.zipWithIndex.foreach { case (k, i) =>
      assert(ChunkGrid.keyForIndex(i, Seq("t", "x"), chunks, dims) == k)
    }
  }

  test("indexForKey inverts keyForIndex over the whole grid") {
    val chunks = Map("t" -> 3, "x" -> 4)
    ChunkGrid.iterChunkKeys(Seq("t", "x"), chunks, dims).zipWithIndex.foreach {
      case (k, i) =>
        assert(ChunkGrid.indexForKey(k, Seq("t", "x"), chunks, dims) == i.toLong)
    }
  }

  test("offsetsToRanges clamps the last chunk to the dim edge") {
    val chunks = Map("t" -> 3, "x" -> 4)
    val r = ChunkGrid.offsetsToRanges(ChunkKey("t" -> 9L, "x" -> 4L), chunks, dims)
    assert(r == Map("t" -> (9, 1), "x" -> (4, 2)))
  }

  test("splitBounds reproduces the reference example (5,10,3)") {
    // rechunk.py:374-397: (5, 10, 3) -> [(5,6), (6,9), (9,10)]
    assert(ChunkGrid.splitBounds(5, 10, 3) == Seq((5L, 6L), (6L, 9L), (9L, 10L)))
    assert(ChunkGrid.splitBounds(0, 10, -1) == Seq((0L, 10L)))
    assert(ChunkGrid.splitBounds(0, 9, 3) == Seq((0L, 3L), (3L, 6L), (6L, 9L)))
  }

  test("ChunkKey canonical encoding is deterministic and sorted") {
    val a = ChunkKey(Map("x" -> 4L, "t" -> 0L), Some(Seq("b", "a")))
    val b = ChunkKey(Map("t" -> 0L, "x" -> 4L), Some(Seq("a", "b")))
    assert(a.canonical == b.canonical)
    assert(ChunkKey.empty.canonical == "offsets[]|vars[*]")
  }

  test("ChunkKey.withOffsets: negative removes the dim (core.py:163-181)") {
    val k = ChunkKey("t" -> 3L).withOffsets("x" -> 8L)
    assert(k.offsets == Map("t" -> 3L, "x" -> 8L))
    assert(k.withOffsets("t" -> -1L).offsets == Map("x" -> 8L))
  }

  test("validateChunk error catalog (dataset.py:236-332)") {
    import graft.ndarray.{DType, NdArray}
    val template = Template(Seq("t" -> 10L, "x" -> 6L),
      Map("v" -> VarSpec(Seq("t", "x"), DType.F64)), Map.empty, Map.empty)
    val chunks = Map("t" -> 3, "x" -> 6)
    def chunkOf(shape: Array[Int]) =
      ArrayChunk(Map("v" -> VarArray(Seq("t", "x"), NdArray.zeros(DType.F64, shape))))
    // valid interior + clamped last chunk pass
    ChunkGrid.validateChunk(template, chunks, splitVars = false)(
      ChunkKey("t" -> 0L, "x" -> 0L), chunkOf(Array(3, 6)))
    ChunkGrid.validateChunk(template, chunks, splitVars = false)(
      ChunkKey("t" -> 9L, "x" -> 0L), chunkOf(Array(1, 6)))
    // misaligned offset
    assertThrows[IllegalArgumentException] {
      ChunkGrid.validateChunk(template, chunks, splitVars = false)(
        ChunkKey("t" -> 2L, "x" -> 0L), chunkOf(Array(3, 6)))
    }
    // wrong size
    assertThrows[IllegalArgumentException] {
      ChunkGrid.validateChunk(template, chunks, splitVars = false)(
        ChunkKey("t" -> 0L, "x" -> 0L), chunkOf(Array(2, 6)))
    }
    // unknown variable
    assertThrows[IllegalArgumentException] {
      ChunkGrid.validateChunk(template, chunks, splitVars = false)(
        ChunkKey("t" -> 0L, "x" -> 0L),
        ArrayChunk(Map("nope" -> VarArray(Seq("t", "x"),
          NdArray.zeros(DType.F64, Array(3, 6))))))
    }
  }
}
