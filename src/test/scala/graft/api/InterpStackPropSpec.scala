package graft.api

import org.scalatest.funsuite.AnyFunSuite

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.ndarray.{DType, NdArray}

/** ScalaCheck fuzz over linear interp (the weighted two-row gather)
  * and the stack -> unstack reshape roundtrip, on random shapes and
  * chunk boundaries. */
class InterpStackPropSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(graft.FuzzSeed(201616L))), p)
    assert(res.passed, res.status.toString)
  }

  test("interpLinear at random in-range targets matches naive lerp") {
    val g = for {
      n <- Gen.chooseNum(2, 10)
      chunk <- Gen.chooseNum(1, n)
      m <- Gen.chooseNum(1, 8)
      // targets as exact quarters strictly inside [0, n-1]: dyadic
      // weights, so both engines' arithmetic is exact
      qs <- Gen.listOfN(m, Gen.chooseNum(0, 4 * (n - 1)))
      seed <- Gen.chooseNum(0, 1000)
    } yield (n, chunk, qs.map(_ / 4.0).toArray, seed)
    check(Prop.forAllNoShrink(g) { case (n, chunk, targets, seed) =>
      val vals = Array.tabulate(n)(i => (((i * 31 + seed) % 101) - 50) / 2.0)
      val ds = XbeamDataset.fromLocal(spark,
        Map("v" -> (Seq("t"), NdArray.fromDoubles(DType.F64, Array(n), vals))),
        coords = Map("t" -> NdArray.fromDoubles(DType.F64, Array(n),
          Array.tabulate(n)(_.toDouble))),
        chunks = Map("t" -> chunk))
      val got = ds.interpLinear("t", targets)
        .collectConsolidated()._2.vars("v").arr.toDoubles
      val exp = targets.map { x =>
        val lo = math.floor(x).toInt
        val hi = math.min(n - 1, lo + 1)
        val w = x - lo
        (1 - w) * vals(lo) + w * vals(hi)
      }
      (got.length == exp.length &&
        got.zip(exp).forall { case (a, b) => a == b }) :|
        s"n=$n chunk=$chunk targets=${targets.toSeq} got=${got.toSeq} " +
          s"exp=${exp.toSeq}"
    }, n = 30)
  }

  test("stack(t,x) -> unstack is the identity across random chunkings") {
    val g = for {
      n0 <- Gen.chooseNum(2, 8)
      c0 <- Gen.chooseNum(1, n0)
      n1 <- Gen.chooseNum(2, 6)
      seed <- Gen.chooseNum(0, 1000)
    } yield (n0, c0, n1, seed)
    check(Prop.forAllNoShrink(g) { case (n0, c0, n1, seed) =>
      val vals = Array.tabulate(n0 * n1)(
        i => (((i * 31 + seed) % 101) - 50) / 2.0)
      val src = NdArray.fromDoubles(DType.F64, Array(n0, n1), vals)
      // trailing dim must be unchunked (whole rows) — the stack contract
      val ds = XbeamDataset.fromLocal(spark,
        Map("v" -> (Seq("t", "x"), src)),
        chunks = Map("t" -> c0, "x" -> n1))
      val round = ds.stack(Seq("t", "x"), "s").unstack("s", "t2", "x2", n1)
      val got = round.collectConsolidated()._2.vars("v").arr
      (round.template.dimSizes("t2") == n0.toLong &&
        round.template.dimSizes("x2") == n1.toLong &&
        got.sameAs(src)) :|
        s"n0=$n0 c0=$c0 n1=$n1 got=${got.toDoubles.toSeq}"
    }, n = 20)
  }
}
