package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.Fixtures.arange
import graft.core.{ArrayChunk, ChunkKey, VarArray}
import graft.ndarray.{DType, NdArray}

class ChunkOpsSpec extends AnyFunSuite {

  def chunk(dims: Seq[String], arr: NdArray): ArrayChunk =
    ArrayChunk(Map("v" -> VarArray(dims, arr)))

  test("splitChunks: regular grid") {
    val c = chunk(Seq("t"), arange(DType.F64, 6))
    val parts = ChunkOps.splitChunks(ChunkKey("t" -> 0L), c, Map("t" -> 2))
    assert(parts.map(_._1.offsets("t")) == Seq(0L, 2L, 4L))
    assert(parts.map(_._2.vars("v").arr.toDoubles.toSeq) ==
      Seq(Seq(0.0, 1.0), Seq(2.0, 3.0), Seq(4.0, 5.0)))
  }

  test("splitChunks: offset not aligned to grid start (rechunk.py example)") {
    // chunk covering [5, 10) split on multiples of 3 -> [5,6),[6,9),[9,10)
    val c = chunk(Seq("t"), arange(DType.F64, 5))
    val parts = ChunkOps.splitChunks(ChunkKey("t" -> 5L), c, Map("t" -> 3))
    assert(parts.map(p => (p._1.offsets("t"), p._2.vars("v").arr.size)) ==
      Seq((5L, 1L), (6L, 3L), (9L, 1L)))
  }

  test("split then consolidate is identity (uneven chunks too)") {
    val src = arange(DType.F64, 7, 5)
    val c = chunk(Seq("t", "x"), src)
    val parts = ChunkOps.splitChunks(ChunkKey("t" -> 0L, "x" -> 0L), c,
      Map("t" -> 3, "x" -> 2))
    assert(parts.length == 9)
    val back = ChunkOps.consolidateChunks(parts)
    assert(back.length == 1)
    assert(back.head._1.offsets == Map("t" -> 0L, "x" -> 0L))
    assert(back.head._2.vars("v").arr.sameAs(src))
  }

  test("consolidateChunks errors: duplicate keys, missing chunks") {
    val c = chunk(Seq("t"), arange(DType.F64, 2))
    val k = ChunkKey("t" -> 0L)
    assertThrows[IllegalArgumentException] {
      ChunkOps.consolidateChunks(Seq(k -> c, k -> c))
    }
    // missing middle chunk of a 3-chunk grid
    val parts = ChunkOps.splitChunks(ChunkKey("t" -> 0L),
      chunk(Seq("t"), arange(DType.F64, 6)), Map("t" -> 2))
    val ex = intercept[IllegalArgumentException] {
      ChunkOps.consolidateChunks(Seq(parts.head, parts.last))
    }
    assert(ex.getMessage.contains("missing"))
  }

  test("splitVariables emits one chunk per var, dropping foreign offsets") {
    val c = ArrayChunk(Map(
      "a" -> VarArray(Seq("t", "x"), arange(DType.F64, 2, 3)),
      "b" -> VarArray(Seq("t"), arange(DType.F64, 2))))
    val parts = ChunkOps.splitVariables(ChunkKey("t" -> 2L, "x" -> 3L), c)
    assert(parts.map(_._1.vars.get.head) == Seq("a", "b"))
    assert(parts(0)._1.offsets == Map("t" -> 2L, "x" -> 3L))
    assert(parts(1)._1.offsets == Map("t" -> 2L)) // b lacks dim x
  }

  test("consolidateVariables merges var sets; overlap is an error") {
    val a = (ChunkKey.withVars(Map("t" -> 0L), Set("a")),
      ArrayChunk(Map("a" -> VarArray(Seq("t"), arange(DType.F64, 2)))))
    val b = (ChunkKey.withVars(Map("t" -> 0L), Set("b")),
      ArrayChunk(Map("b" -> VarArray(Seq("t"), arange(DType.F64, 2)))))
    val (k, merged) = ChunkOps.consolidateVariables(Seq(a, b))
    assert(k.vars.isEmpty && merged.varNames == Set("a", "b"))
    assertThrows[IllegalArgumentException] {
      ChunkOps.consolidateVariables(Seq(a, a))
    }
  }

  test("roundChunkKey (rechunk.py:292-306)") {
    val k = ChunkKey("t" -> 7L, "x" -> 3L)
    assert(ChunkOps.roundChunkKey(k, Map("t" -> 4)) ==
      ChunkKey("t" -> 4L, "x" -> 3L))
    assert(ChunkOps.roundChunkKey(k, Map("t" -> -1)) ==
      ChunkKey("t" -> 0L, "x" -> 3L))
  }

  test("inMemoryRechunk regrids values exactly") {
    val src = arange(DType.F64, 10)
    val parts = ChunkOps.splitChunks(ChunkKey("t" -> 0L),
      chunk(Seq("t"), src), Map("t" -> 3))
    val regridded = ChunkOps.inMemoryRechunk(parts, Map("t" -> 4))
    assert(regridded.map(_._1.offsets("t")) == Seq(0L, 4L, 8L))
    val back = ChunkOps.consolidateChunks(regridded)
    assert(back.head._2.vars("v").arr.sameAs(src))
  }
}
