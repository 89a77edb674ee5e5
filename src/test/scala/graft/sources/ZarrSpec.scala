package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.Fixtures.arange
import graft.core.{Template, VarSpec}
import graft.ndarray.{DType, NdArray}

class ZarrSpec extends AnyFunSuite {

  def tmpStore(): String =
    Files.createTempDirectory("zarrspec").toString

  val template = Template(
    Seq("t" -> 10L, "x" -> 6L),
    Map("v" -> VarSpec(Seq("t", "x"), DType.F64)),
    coords = Map("t" -> arange(DType.I64, 10)),
    attrs = Map("title" -> "spec"))

  test("setup + region write + read roundtrip (uneven edge chunks)") {
    val path = tmpStore()
    val chunks = Map("t" -> 4, "x" -> 6)
    Zarr.setupStore(path, template, chunks)
    val meta = Zarr.readArrayMeta(path, "v")
    assert(meta.shape == Seq(10L, 6L) && meta.chunks == Seq(4, 6))
    // write three regions: [0,4), [4,8), [8,10) — the last one uneven
    val data = arange(DType.F64, 10, 6)
    Zarr.writeRegion(path, "v", meta, Array(0L, 0L), data.slice(Array(0, 0), Array(4, 6)))
    Zarr.writeRegion(path, "v", meta, Array(4L, 0L), data.slice(Array(4, 0), Array(4, 6)))
    Zarr.writeRegion(path, "v", meta, Array(8L, 0L), data.slice(Array(8, 0), Array(2, 6)))
    val back = Zarr.readRegion(path, "v", meta, Array(0L, 0L), Array(10, 6))
    assert(back.sameAs(data))
    // arbitrary unaligned region read spans blocks
    val mid = Zarr.readRegion(path, "v", meta, Array(3L, 2L), Array(4, 3))
    assert(mid.sameAs(data.slice(Array(3, 2), Array(4, 3))))
  }

  test("openStore infers dims/vars/coords/attrs and stored chunking") {
    val path = tmpStore()
    Zarr.setupStore(path, template, Map("t" -> 5, "x" -> 3))
    val store = Zarr.openStore(path)
    assert(store.dims.toMap == Map("t" -> 10L, "x" -> 6L))
    assert(store.dataVars.keySet == Set("v"))
    assert(store.coordVars.keySet == Set("t"))
    assert(store.inferChunks == Map("t" -> 5, "x" -> 3))
    assert(store.attrs == Map("title" -> "spec"))
    val coord = Zarr.readCoord(path, "t").get
    assert(coord.toLongs.toSeq == (0L until 10L))
    assert(Files.exists(java.nio.file.Paths.get(path, ".zmetadata")))
  }

  test("zlib compression roundtrips") {
    val path = tmpStore()
    Zarr.setupStore(path, template, Map("t" -> 4, "x" -> 6), Some("zlib"))
    val meta = Zarr.readArrayMeta(path, "v")
    assert(meta.compressor.contains("zlib"))
    val data = arange(DType.F64, 10, 6)
    Zarr.writeRegion(path, "v", meta, Array(0L, 0L), data)
    assert(Zarr.readRegion(path, "v", meta, Array(0L, 0L), Array(10, 6)).sameAs(data))
  }

  test("missing blocks read as fill value (NaN for floats)") {
    val path = tmpStore()
    Zarr.setupStore(path, template, Map("t" -> 4, "x" -> 6))
    val meta = Zarr.readArrayMeta(path, "v")
    val r = Zarr.readRegion(path, "v", meta, Array(0L, 0L), Array(2, 2))
    assert(r.toDoubles.forall(_.isNaN))
  }

  test("misaligned region write is rejected (race prevention, zarr.py:517-587)") {
    val path = tmpStore()
    Zarr.setupStore(path, template, Map("t" -> 4, "x" -> 6))
    val meta = Zarr.readArrayMeta(path, "v")
    assertThrows[IllegalArgumentException] {
      Zarr.writeRegion(path, "v", meta, Array(2L, 0L), arange(DType.F64, 4, 6))
    }
    // region ending mid-chunk (not at array edge) also rejected
    assertThrows[IllegalArgumentException] {
      Zarr.writeRegion(path, "v", meta, Array(0L, 0L), arange(DType.F64, 3, 6))
    }
  }
}
