package graft.ndarray

import org.scalatest.funsuite.AnyFunSuite

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the kernel primitives every operator is
  * built on: slice/insert tiling, transpose involution, and
  * slice-of-transpose commutation, across dtypes and 1-3 dims. */
class NdArrayPropSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 80): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(graft.FuzzSeed(201610L))), p)
    assert(res.passed, res.status.toString)
  }

  private val dtypeGen = Gen.oneOf(DType.F64, DType.F32, DType.I64,
    DType.I32, DType.I16, DType.I8, DType.U8)

  private def mk(dtype: DType, shape: Array[Int], seed: Int): NdArray =
    NdArray.fromDoubles(dtype, shape, Array.tabulate(shape.product) { i =>
      val v = ((i * 53 + seed) % 201) - 100
      dtype match {
        case DType.F64 | DType.F32 => v / 2.0
        case DType.U8 => (v + 100).toDouble
        case _ => v.toDouble
      }
    })

  private val arrGen = for {
    dtype <- dtypeGen
    ndim <- Gen.chooseNum(1, 3)
    shape <- Gen.listOfN(ndim, Gen.chooseNum(1, 6))
    seed <- Gen.chooseNum(0, 1000)
  } yield mk(dtype, shape.toArray, seed)

  test("slice(starts, shape) agrees with per-cell indexing") {
    val g = for {
      a <- arrGen
      starts <- Gen.sequence[List[Int], Int](
        a.shape.toList.map(s => Gen.chooseNum(0, s - 1)))
      lens <- Gen.sequence[List[Int], Int](
        a.shape.toList.zip(starts).map { case (s, st) =>
          Gen.chooseNum(1, s - st) })
    } yield (a, starts.toArray, lens.toArray)
    check(Prop.forAllNoShrink(g) { case (a, starts, lens) =>
      val sl = a.slice(starts, lens)
      val n = lens.product
      val ok = (0 until n).forall { flat =>
        // unravel flat into the slice's coords
        var rem = flat
        val coords = new Array[Int](lens.length)
        var d = lens.length - 1
        while (d >= 0) { coords(d) = rem % lens(d); rem /= lens(d); d -= 1 }
        var srcFlat = 0L
        var dd = 0
        while (dd < lens.length) {
          srcFlat = srcFlat * a.shape(dd) + (starts(dd) + coords(dd)); dd += 1
        }
        sl.getDouble(flat.toLong) == a.getDouble(srcFlat)
      }
      ok :| s"dtype=${a.dtype} shape=${a.shape.toSeq} starts=${starts.toSeq} lens=${lens.toSeq}"
    })
  }

  test("tiling a zeroed copy with slices reassembles the original") {
    val g = for {
      a <- arrGen
      cuts <- Gen.sequence[List[Int], Int](
        a.shape.toList.map(s => Gen.chooseNum(1, s)))
    } yield (a, cuts.toArray)
    check(Prop.forAllNoShrink(g) { case (a, chunk) =>
      val out = NdArray.zeros(a.dtype, a.shape)
      // iterate the chunk grid
      def rec(d: Int, starts: Array[Int]): Unit =
        if (d == a.ndim) {
          val lens = a.shape.indices.map(i =>
            math.min(chunk(i), a.shape(i) - starts(i))).toArray
          out.insert(starts.clone(), a.slice(starts.clone(), lens))
        } else {
          var st = 0
          while (st < a.shape(d)) {
            starts(d) = st; rec(d + 1, starts); st += chunk(d)
          }
        }
      rec(0, new Array[Int](a.ndim))
      (out.sameAs(a) && out.dtype == a.dtype) :|
        s"dtype=${a.dtype} shape=${a.shape.toSeq} chunk=${chunk.toSeq}"
    })
  }

  test("transpose by a permutation then its inverse is the identity") {
    val g = for {
      a <- arrGen
      perm <- Gen.const(()).map(_ =>
        new scala.util.Random(a.data.length).shuffle(a.shape.indices.toList))
    } yield (a, perm.toArray)
    check(Prop.forAllNoShrink(g) { case (a, perm) =>
      val t = a.transpose(perm)
      val inv = new Array[Int](perm.length)
      perm.zipWithIndex.foreach { case (p, i) => inv(p) = i }
      val back = t.transpose(inv)
      (t.shape.toSeq == perm.toSeq.map(a.shape) && back.sameAs(a)) :|
        s"dtype=${a.dtype} shape=${a.shape.toSeq} perm=${perm.toSeq}"
    })
  }

  test("astype agrees with per-cell C-cast semantics on every dtype pair") {
    val g = for {
      a <- arrGen
      target <- dtypeGen
    } yield (a, target)
    check(Prop.forAll(g) { case (a, target) =>
      val out = a.astype(target)
      val floatSide = Seq(a.dtype, target)
        .exists(d => d == DType.F32 || d == DType.F64)
      val ok = out.dtype == target && out.shape.sameElements(a.shape) &&
        (0L until a.size).forall { i =>
          if (floatSide) {
            // value routes through double then the target's setDouble:
            // float targets keep it (F32 narrows), int targets truncate
            val expect = NdArray.zeros(target, Array(1))
            expect.setDouble(0L, a.getDouble(i))
            out.getDouble(i) == expect.getDouble(0L)
          } else out.getLong(i) == {
            val expect = NdArray.zeros(target, Array(1))
            expect.setLong(0L, a.getLong(i))
            expect.getLong(0L)
          }
        }
      // same-dtype cast is the identity object
      (ok && (a.astype(a.dtype) eq a)) :|
        s"src=${a.dtype} dst=$target shape=${a.shape.toSeq}"
    })
  }
}
