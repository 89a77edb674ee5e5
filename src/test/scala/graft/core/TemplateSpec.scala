package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.Fixtures.arange
import graft.ndarray.DType

class TemplateSpec extends AnyFunSuite {

  val tmpl = Template(
    Seq("t" -> 1L, "x" -> 6L),
    Map("v" -> VarSpec(Seq("t", "x"), DType.F64)),
    coords = Map("t" -> arange(DType.I64, 1)),
    attrs = Map.empty)

  test("replaceDims grows a dim by size and drops its stale coord " +
       "(replace_template_dims, zarr.py:150-226)") {
    val grown = tmpl.replaceDims(sizes = Map("t" -> 100L))
    assert(grown.dimSizes == Map("t" -> 100L, "x" -> 6L))
    assert(!grown.coords.contains("t"))
  }

  test("replaceDims with a coordinate sets coord and size together") {
    val coord = arange(DType.I64, 50)
    val grown = tmpl.replaceDims(newCoords = Map("t" -> coord))
    assert(grown.dimSizes("t") == 50L)
    assert(grown.coords("t").sameAs(coord))
  }

  test("replaceDims rejects unknown dims") {
    assertThrows[IllegalArgumentException] {
      tmpl.replaceDims(sizes = Map("bogus" -> 1L))
    }
  }

  test("combinedItemsize: 1 for empty vars (dummy uint8, dataset.py:170-177)") {
    assert(tmpl.copy(vars = Map.empty).combinedItemsize(false) == 1L)
  }

  test("ChunkKey.canonical is insertion-order independent (KeyCoder " +
       "determinism, core.py:228-237)") {
    val a = ChunkKey(Map("x" -> 5L, "t" -> 0L), Some(Seq("b", "a")))
    val b = ChunkKey(Map("t" -> 0L) + ("x" -> 5L), Some(Seq("a", "b")))
    assert(a.canonical == b.canonical)
    assert(a.canonical == "offsets[t=0,x=5]|vars[a,b]")
    // vars=None encodes distinctly from vars=all
    assert(ChunkKey(Map("t" -> 0L), None).canonical == "offsets[t=0]|vars[*]")
    // withOffsets: negative removes the dim (core.py:163-181)
    assert(a.withOffsets("x" -> -1L).canonical == "offsets[t=0]|vars[a,b]")
  }
}
