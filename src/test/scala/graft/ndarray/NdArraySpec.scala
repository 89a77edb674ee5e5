package graft.ndarray

import org.scalatest.funsuite.AnyFunSuite

import graft.Fixtures.arange

class NdArraySpec extends AnyFunSuite {

  test("shape/size/strides/bytes") {
    val a = arange(DType.F64, 2, 3, 4)
    assert(a.size == 24)
    assert(a.nbytes == 192)
    assert(a.strides.toSeq == Seq(12L, 4L, 1L))
  }

  test("slice extracts a hyper-rectangle (row-major values)") {
    val a = arange(DType.I64, 3, 4) // [[0..3],[4..7],[8..11]]
    val s = a.slice(Array(1, 1), Array(2, 2))
    assert(s.toLongs.toSeq == Seq(5L, 6L, 9L, 10L))
  }

  test("slice/insert roundtrip") {
    val a = arange(DType.F32, 4, 5)
    val s = a.slice(Array(1, 2), Array(2, 3))
    val out = NdArray.zeros(DType.F32, Array(4, 5))
    out.insert(Array(1, 2), s)
    val expect = a.toDoubles.zipWithIndex.map { case (v, i) =>
      val (r, c) = (i / 5, i % 5)
      if (r >= 1 && r < 3 && c >= 2 && c < 5) v else 0.0
    }
    assert(out.toDoubles.toSeq == expect.toSeq)
  }

  test("transpose permutes axes like numpy") {
    val a = arange(DType.I32, 2, 3)
    val t = a.transpose(Array(1, 0))
    assert(t.shape.toSeq == Seq(3, 2))
    assert(t.toLongs.toSeq == Seq(0L, 3L, 1L, 4L, 2L, 5L))
    // double transpose is identity
    assert(t.transpose(Array(1, 0)).sameAs(a))
  }

  test("transpose preserves float values bit-exactly (regression)") {
    val a = NdArray.fromDoubles(DType.F64, Array(2, 2),
      Array(1.5, -2.25, 3.75, Double.NaN))
    val t = a.transpose(Array(1, 0))
    assert(t.toDoubles.take(3).toSeq == Seq(1.5, 3.75, -2.25))
    assert(t.toDoubles(3).isNaN)
    val f = NdArray.fromDoubles(DType.F32, Array(1, 2), Array(6.0, 4.5))
    assert(f.transpose(Array(1, 0)).toDoubles.toSeq == Seq(6.0, 4.5))
  }

  test("sumCount reduces along given axes") {
    val a = arange(DType.F64, 2, 3) // [[0,1,2],[3,4,5]]
    val (s0, c0) = a.sumCount(Array(0), skipna = true)
    assert(s0.toDoubles.toSeq == Seq(3.0, 5.0, 7.0))
    assert(c0.toDoubles.toSeq == Seq(2.0, 2.0, 2.0))
    val (s1, _) = a.sumCount(Array(1), skipna = true)
    assert(s1.toDoubles.toSeq == Seq(3.0, 12.0))
    val (sAll, cAll) = a.sumCount(Array(0, 1), skipna = true)
    assert(sAll.toDoubles.toSeq == Seq(15.0))
    assert(cAll.toDoubles.toSeq == Seq(6.0))
  }

  test("sumCount skipna ignores NaN; keepna counts it") {
    val a = NdArray.fromDoubles(DType.F64, Array(3), Array(1.0, Double.NaN, 2.0))
    val (s, c) = a.sumCount(Array(0), skipna = true)
    assert(s.toDoubles.toSeq == Seq(3.0) && c.toDoubles.toSeq == Seq(2.0))
    val (s2, c2) = a.sumCount(Array(0), skipna = false)
    assert(s2.toDoubles.head.isNaN && c2.toDoubles.toSeq == Seq(3.0))
  }

  test("blockAssemble tiles blocks (np.block analogue)") {
    val tl = arange(DType.I64, 2, 2)
    val tr = NdArray.fill(DType.I64, Array(2, 1), 9)
    val bl = NdArray.fill(DType.I64, Array(1, 2), 7)
    val br = NdArray.fill(DType.I64, Array(1, 1), 8)
    val out = NdArray.blockAssemble(DType.I64, Array(3, 3), Seq(
      (Array(0, 0), tl), (Array(0, 2), tr), (Array(2, 0), bl), (Array(2, 2), br)))
    assert(out.toLongs.toSeq == Seq(0L, 1L, 9L, 2L, 3L, 9L, 7L, 7L, 8L))
  }

  test("dtype views: f32 roundtrips through double, i64 exact") {
    val f = NdArray.fromDoubles(DType.F32, Array(2), Array(1.5, -2.25))
    assert(f.toDoubles.toSeq == Seq(1.5, -2.25))
    val big = 1L << 60
    val i = NdArray.fromLongs(DType.I64, Array(1), Array(big))
    assert(i.toLongs.toSeq == Seq(big))
  }

  test("allClose: NaN == NaN, tolerance respected") {
    val a = NdArray.fromDoubles(DType.F64, Array(2), Array(1.0, Double.NaN))
    val b = NdArray.fromDoubles(DType.F64, Array(2), Array(1.0 + 1e-12, Double.NaN))
    assert(a.allClose(b))
  }
}
