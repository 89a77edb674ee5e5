package graft.api

import org.scalatest.funsuite.AnyFunSuite

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.ndarray.{DType, NdArray}

/** ScalaCheck fuzz over the cross-chunk machinery — prefix scans
  * (sliver exchange), shift and rolling (halo exchange) — on random
  * shapes and, critically, random CHUNK BOUNDARIES: every cross-chunk
  * bug ever found in these paths was a boundary condition, so the
  * property is exactly "the distributed answer equals the naive
  * single-array loop regardless of where the chunk cuts fall". */
class CrossChunkPropSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(graft.FuzzSeed(201613L))), p)
    assert(res.passed, res.status.toString)
  }

  // 2-D dataset (scan dim d0, passenger dim d1) with random chunking
  private val caseGen = for {
    n0 <- Gen.chooseNum(2, 12)
    c0 <- Gen.chooseNum(1, n0)
    n1 <- Gen.chooseNum(1, 3)
    seed <- Gen.chooseNum(0, 1000)
  } yield (n0, c0, n1, seed)

  private def mkVals(n: Int, seed: Int): Array[Double] =
    Array.tabulate(n)(i => (((i * 31 + seed) % 101) - 50) / 2.0)

  private def ds(n0: Int, c0: Int, n1: Int, vals: Array[Double]) =
    XbeamDataset.fromLocal(spark,
      Map("v" -> (Seq("d0", "d1"),
        NdArray.fromDoubles(DType.F64, Array(n0, n1), vals))),
      chunks = Map("d0" -> c0, "d1" -> n1))

  private def collect(x: XbeamDataset): Array[Double] =
    x.collectConsolidated()._2.vars("v").arr.toDoubles

  test("cumsum across random chunk boundaries equals the naive prefix") {
    check(Prop.forAllNoShrink(caseGen) { case (n0, c0, n1, seed) =>
      val vals = mkVals(n0 * n1, seed)
      val got = collect(ds(n0, c0, n1, vals).cumsum("d0"))
      val exp = new Array[Double](n0 * n1)
      (0 until n1).foreach { j =>
        var acc = 0.0
        (0 until n0).foreach { i => acc += vals(i * n1 + j); exp(i * n1 + j) = acc }
      }
      got.zip(exp).forall { case (g, e) => math.abs(g - e) < 1e-9 } :|
        s"n0=$n0 c0=$c0 n1=$n1 got=${got.toSeq} exp=${exp.toSeq}"
    }, n = 25)
  }

  test("shift (both signs) across random chunk boundaries") {
    val g = for {
      base <- caseGen
      p <- Gen.oneOf(-3, -1, 1, 2)
    } yield (base, p)
    check(Prop.forAllNoShrink(g) { case ((n0, c0, n1, seed), p) =>
      val vals = mkVals(n0 * n1, seed)
      // halo-exchange contract: a halo deeper than one chunk must fail
      // loudly and name the remedy (slivers ship one neighbor only)
      if (math.abs(p) > c0) {
        val e = intercept[IllegalArgumentException](
          collect(ds(n0, c0, n1, vals).shift("d0", p)))
        e.getMessage.contains("rechunk larger") :| s"err=${e.getMessage}"
      } else {
      val got = collect(ds(n0, c0, n1, vals).shift("d0", p))
      val ok = (0 until n0).forall { i =>
        (0 until n1).forall { j =>
          val src = i - p
          val e = if (src < 0 || src >= n0) Double.NaN else vals(src * n1 + j)
          val gv = got(i * n1 + j)
          (gv.isNaN && e.isNaN) || gv == e
        }
      }
      ok :| s"n0=$n0 c0=$c0 p=$p got=${got.toSeq}"
      }
    }, n = 25)
  }

  test("rolling sum/min (trailing + centered) across random chunk boundaries") {
    val g = for {
      base <- caseGen
      w <- Gen.chooseNum(2, 4)
      op <- Gen.oneOf("sum", "min", "quantile:0.25", "quantile:0.9")
      center <- Gen.oneOf(false, true)
    } yield (base, w, op, center)
    check(Prop.forAllNoShrink(g) { case ((n0, c0, n1, seed), w, op, center) =>
      val vals = mkVals(n0 * n1, seed)
      val halo = if (center) w - 1 - (w - 1) / 2 else w - 1
      if (halo > c0) {
        val e = intercept[IllegalArgumentException](
          collect(ds(n0, c0, n1, vals).rolling("d0", w, op,
            minPeriods = 1, center = center)))
        e.getMessage.contains("rechunk larger") :| s"err=${e.getMessage}"
      } else {
      val got = collect(ds(n0, c0, n1, vals).rolling("d0", w, op,
        minPeriods = 1, center = center))
      val ok = (0 until n0).forall { i =>
        (0 until n1).forall { j =>
          // window positions: trailing = [i-w+1, i]; centered =
          // [i-(w-1-h), i+h] with h = (w-1)/2 — the extra slot of an
          // even window goes to the PAST side (pandas convention,
          // matching XbeamDataset.rolling's centered halo)
          val h = (w - 1) / 2
          val (start, end) = if (center) (i - (w - 1 - h), i + h)
            else (i - w + 1, i)
          val xs = (math.max(0, start) to math.min(n0 - 1, end))
            .map(k => vals(k * n1 + j))
          val e = op match {
            case "sum" => xs.sum
            case "min" => xs.min
            case q if q.startsWith("quantile:") =>
              // numpy-linear order statistic at q*(n-1)
              val qq = q.stripPrefix("quantile:").toDouble
              val sorted = xs.sorted
              val pos = qq * (sorted.length - 1)
              val lo = pos.toInt
              val frac = pos - lo
              if (frac == 0.0 || lo + 1 >= sorted.length) sorted(lo)
              else sorted(lo) + frac * (sorted(lo + 1) - sorted(lo))
          }
          math.abs(got(i * n1 + j) - e) < 1e-9
        }
      }
      ok :| s"n0=$n0 c0=$c0 w=$w op=$op center=$center got=${got.toSeq}"
      }
    }, n = 30)
  }

  test("convolve across random chunk boundaries equals the naive kernel") {
    val g = for {
      base <- caseGen
      w <- Gen.chooseNum(2, 5)
    } yield (base, w)
    check(Prop.forAllNoShrink(g) { case ((n0, c0, n1, seed), w) =>
      val vals = mkVals(n0 * n1, seed)
      // quarter-step weights: products with the half-step values are
      // exact eighths, so the naive loop must match bit-for-bit
      val wts = Array.tabulate(w)(k => (((k * 13 + seed) % 7) - 3) / 4.0)
      if (w - 1 > c0) {
        val e = intercept[IllegalArgumentException](
          collect(ds(n0, c0, n1, vals).convolve("d0", wts)))
        e.getMessage.contains("rechunk larger") :| s"err=${e.getMessage}"
      } else {
        val got = collect(ds(n0, c0, n1, vals).convolve("d0", wts))
        val ok = (0 until n0).forall { i =>
          (0 until n1).forall { j =>
            val gv = got(i * n1 + j)
            if (i < w - 1) gv.isNaN
            else {
              var acc = 0.0
              (0 until w).foreach(k => acc += wts(k) * vals((i - w + 1 + k) * n1 + j))
              gv == acc
            }
          }
        }
        ok :| s"n0=$n0 c0=$c0 n1=$n1 w=$w wts=${wts.toSeq} got=${got.toSeq}"
      }
    }, n = 30)
  }

  test("broadcastLike tiles values across any new-dim chunking") {
    // a (d1,) sliver broadcast against a (d0, d1) target: every d0
    // row of the output must equal the sliver, for ANY chunk cut on
    // either dim of the target (incl. ragged tails)
    val g = for {
      n0 <- Gen.chooseNum(1, 12)
      c0 <- Gen.chooseNum(1, n0)
      n1 <- Gen.chooseNum(1, 5)
      c1 <- Gen.chooseNum(1, n1)
      seed <- Gen.chooseNum(0, 1000)
    } yield (n0, c0, n1, c1, seed)
    check(Prop.forAllNoShrink(g) { case (n0, c0, n1, c1, seed) =>
      val sliver = mkVals(n1, seed)
      val src = XbeamDataset.fromLocal(spark,
        Map("v" -> (Seq("d1"),
          NdArray.fromDoubles(DType.F64, Array(n1), sliver))),
        chunks = Map("d1" -> c1))
      val tgt = ds(n0, c0, n1, Array.fill(n0 * n1)(0.0))
        .rechunk(Map("d1" -> c1))
      val out = src.broadcastLike(tgt)
      val got = out.collectConsolidated()._2.vars("v").arr
      val ok = got.shape.toSeq == Seq(n0, n1) &&
        got.toDoubles.toSeq == Seq.fill(n0)(sliver.toSeq).flatten
      ok :| s"n0=$n0 c0=$c0 n1=$n1 c1=$c1 got=${got.toDoubles.toSeq} " +
        s"sliver=${sliver.toSeq}"
    }, n = 40)
  }
}
