package graft.api

import org.scalatest.funsuite.AnyFunSuite

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.ndarray.{DType, NdArray}

/** ScalaCheck fuzz over the two remaining always-on paths: the tabular
  * bridge (every relational gate crosses it twice) and the sumCount
  * reduction kernel (under every mean/sum/var). */
class BridgePropSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(graft.FuzzSeed(201611L))), p)
    assert(res.passed, res.status.toString)
  }

  private def mk(dtype: DType, shape: Array[Int], seed: Int): NdArray =
    NdArray.fromDoubles(dtype, shape, Array.tabulate(shape.product) { i =>
      val v = ((i * 53 + seed) % 201) - 100
      dtype match {
        case DType.F64 | DType.F32 => v / 2.0
        case DType.U8 => (v + 100).toDouble
        case _ => v.toDouble
      }
    })

  test("toDataFrame -> fromDataFrame roundtrips values, dtype, and grid") {
    val g = for {
      dtype <- Gen.oneOf(DType.F64, DType.F32, DType.I64, DType.I32,
        DType.I16, DType.U8)
      ndim <- Gen.chooseNum(1, 2)
      dims <- Gen.listOfN(ndim, for {
        size <- Gen.chooseNum(1, 8)
        chunk <- Gen.chooseNum(1, size)
      } yield (size, chunk))
      seed <- Gen.chooseNum(0, 1000)
    } yield (dtype, dims.toVector, seed)
    check(Prop.forAllNoShrink(g) { case (dtype, dims, seed) =>
      val names = dims.indices.map(i => s"d$i")
      val shape = dims.map(_._1).toArray
      val src = mk(dtype, shape, seed)
      val ds = XbeamDataset.fromLocal(spark, Map("v" -> (names, src)),
        chunks = names.zip(dims.map(_._2)).toMap)
      val df = TabularBridge.toDataFrame(ds)
      val back = TabularBridge.fromDataFrame(df, spark,
        dims = names.zip(shape.map(_.toLong)),
        vars = Seq("v" -> dtype),
        chunks = names.zip(dims.map(_._2)).toMap)
      val got = back.collectConsolidated()._2.vars("v").arr
      (got.dtype == dtype && got.sameAs(src) &&
        back.chunkSizes == ds.chunkSizes) :|
        s"dtype=$dtype dims=$dims"
    }, n = 20)
  }

  test("rechunk to any grid is identity on values (incl. forced multistage)") {
    val g = for {
      ndim <- Gen.chooseNum(1, 2)
      dims <- Gen.listOfN(ndim, for {
        size <- Gen.chooseNum(2, 10)
        srcChunk <- Gen.chooseNum(1, size)
        dstChunk <- Gen.chooseNum(1, size)
      } yield (size, srcChunk, dstChunk))
      seed <- Gen.chooseNum(0, 1000)
      // tiny maxMem forces the planner through real intermediate stages
      // on some cases; 1 GiB takes the single-stage fast path
      tightMem <- Gen.oneOf(false, true)
    } yield (dims.toVector, seed, tightMem)
    check(Prop.forAllNoShrink(g) { case (dims, seed, tightMem) =>
      val names = dims.indices.map(i => s"d$i")
      val shape = dims.map(_._1).toArray
      val src = mk(DType.F64, shape, seed)
      val ds = XbeamDataset.fromLocal(spark, Map("v" -> (names, src)),
        chunks = names.zip(dims.map(_._2)).toMap)
      val maxMem = if (tightMem) 8L * math.max(1,
        math.max(dims.map(_._2).product, dims.map(_._3).product))
      else 1L << 30
      val re = ds.rechunk(names.zip(dims.map(_._3)).toMap, maxMem = maxMem)
      val got = re.collectConsolidated()._2.vars("v").arr
      (got.sameAs(src) &&
        names.zip(dims.map(_._3)).forall { case (d, c) =>
          re.chunkSizes(d) == c }) :|
        s"dims=$dims tightMem=$tightMem got=${re.chunkSizes}"
    }, n = 20)
  }

  test("sumCount along random axes agrees with a naive per-cell loop") {
    val g = for {
      ndim <- Gen.chooseNum(1, 3)
      shape <- Gen.listOfN(ndim, Gen.chooseNum(1, 5))
      axes <- Gen.someOf(0 until ndim).suchThat(_.nonEmpty)
      seed <- Gen.chooseNum(0, 1000)
      withNaN <- Gen.oneOf(false, true)
    } yield (shape.toArray, axes.sorted.toArray, seed, withNaN)
    check(Prop.forAllNoShrink(g) { case (shape, axes, seed, withNaN) =>
      val n = shape.product
      val vals = Array.tabulate(n) { i =>
        val v = ((i * 31 + seed) % 101) - 50
        if (withNaN && (i * 7 + seed) % 5 == 0) Double.NaN else v / 2.0
      }
      val a = NdArray.fromDoubles(DType.F64, shape, vals)
      val (sums, counts) = a.sumCount(axes, skipna = true)
      // naive oracle
      val keep = Array.range(0, shape.length).filterNot(axes.contains)
      val outShape = keep.map(shape)
      val expS = new Array[Double](math.max(1, outShape.product))
      val expC = new Array[Double](expS.length)
      (0 until n).foreach { flat =>
        var rem = flat
        val coords = new Array[Int](shape.length)
        var d = shape.length - 1
        while (d >= 0) { coords(d) = rem % shape(d); rem /= shape(d); d -= 1 }
        var out = 0
        keep.foreach { k => out = out * shape(k) + coords(k) }
        if (!vals(flat).isNaN) { expS(out) += vals(flat); expC(out) += 1 }
      }
      val okS = (0 until expS.length).forall(i =>
        math.abs(sums.getDouble(i.toLong) - expS(i)) < 1e-9)
      val okC = (0 until expC.length).forall(i =>
        counts.getDouble(i.toLong) == expC(i))
      (okS && okC) :| s"shape=${shape.toSeq} axes=${axes.toSeq} naN=$withNaN"
    }, n = 120)
  }
}
