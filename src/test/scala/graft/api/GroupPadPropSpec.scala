package graft.api

import org.scalatest.funsuite.AnyFunSuite

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.ndarray.{DType, NdArray}

/** ScalaCheck fuzz over coordinate groupby (interleaved duplicate
  * labels across random chunk boundaries) and the full pad mode
  * catalog (numpy edge semantics at random widths). */
class GroupPadPropSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(graft.FuzzSeed(201615L))), p)
    assert(res.passed, res.status.toString)
  }

  test("groupbyCoordMean over random interleaved labels matches naive means") {
    val g = for {
      n <- Gen.chooseNum(2, 14)
      chunk <- Gen.chooseNum(1, n)
      nGroups <- Gen.chooseNum(1, 4)
      labels <- Gen.listOfN(n, Gen.chooseNum(0, nGroups - 1))
      seed <- Gen.chooseNum(0, 1000)
    } yield (n, chunk, labels.toArray, seed)
    check(Prop.forAllNoShrink(g) { case (n, chunk, labels, seed) =>
      val vals = Array.tabulate(n)(i => (((i * 31 + seed) % 101) - 50) / 2.0)
      val ds = XbeamDataset.fromLocal(spark,
        Map("v" -> (Seq("t"), NdArray.fromDoubles(DType.F64, Array(n), vals))),
        coords = Map("t" -> NdArray.fromLongs(DType.I64, Array(n),
          labels.map(_.toLong))),
        chunks = Map("t" -> chunk))
      val out = ds.groupbyCoordMean("t")
      val got = out.collectConsolidated()._2.vars("v").arr.toDoubles
      val distinct = labels.distinct.sorted
      val exp = distinct.map { gI =>
        val xs = labels.indices.filter(labels(_) == gI).map(vals)
        xs.sum / xs.size
      }
      val coordOk = out.template.coords("t").toDoubles.toSeq ==
        distinct.map(_.toDouble).toSeq
      (coordOk && got.length == exp.length &&
        got.zip(exp).forall { case (a, b) => math.abs(a - b) < 1e-9 }) :|
        s"n=$n chunk=$chunk labels=${labels.toSeq} got=${got.toSeq} exp=${exp.toSeq}"
    }, n = 30)
  }

  test("pad modes match numpy edge semantics at random widths") {
    val g = for {
      n <- Gen.chooseNum(2, 8)
      chunk <- Gen.chooseNum(1, n)
      before <- Gen.chooseNum(0, n - 1) // reflect/wrap need width < n
      after <- Gen.chooseNum(0, n - 1)
      mode <- Gen.oneOf("constant", "edge", "reflect", "symmetric", "wrap")
      seed <- Gen.chooseNum(0, 1000)
    } yield (n, chunk, before, after, mode, seed)
    check(Prop.forAllNoShrink(g) { case (n, chunk, before, after, mode, seed) =>
      val vals = Array.tabulate(n)(i => (((i * 31 + seed) % 101) - 50) / 2.0)
      val ds = XbeamDataset.fromLocal(spark,
        Map("v" -> (Seq("t"), NdArray.fromDoubles(DType.F64, Array(n), vals))),
        chunks = Map("t" -> chunk))
      // widths beyond the edge chunk reject loudly (the halo-style
      // sliver contract — the error names the rechunk remedy); when no
      // error fires, values must match numpy exactly
      val padded =
        try ds.pad("t", before, after, mode)
        catch {
          case e: IllegalArgumentException
              if e.getMessage.contains("rechunk or shrink the pad") =>
            null
        }
      if (padded == null) Prop.passed
      else {
      val got = padded.collectConsolidated()._2.vars("v").arr.toDoubles
      // numpy oracles per mode
      def src(i: Int): Double = {
        val k = i - before
        if (k >= 0 && k < n) vals(k)
        else mode match {
          case "constant" => Double.NaN
          case "edge" => if (k < 0) vals(0) else vals(n - 1)
          case "reflect" => // reflect about the edge CELLS (no repeat)
            if (k < 0) vals(-k) else vals(2 * n - 2 - k)
          case "symmetric" => // reflect about the edge BOUNDARY (repeat)
            if (k < 0) vals(-k - 1) else vals(2 * n - 1 - k)
          case "wrap" =>
            vals(((k % n) + n) % n)
        }
      }
      val ok = got.length == n + before + after &&
        got.indices.forall { i =>
          val e = src(i)
          (got(i).isNaN && e.isNaN) || got(i) == e
        }
      ok :| s"n=$n chunk=$chunk pad=($before,$after) mode=$mode " +
        s"vals=${vals.toSeq} got=${got.toSeq}"
      }
    }, n = 50)
  }
}
