package graft.api

import org.scalatest.funsuite.AnyFunSuite

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.ndarray.{DType, NdArray}

/** ScalaCheck fuzz over the position-gather machinery (reindex/sortby
  * — the paths the r15 x81/x103 regression lived in): random coords,
  * random target label mixes (hits and misses), random chunk
  * boundaries, against naive single-array oracles. Pins BOTH gather
  * contracts: the all-resolved path preserves the source dtype, the
  * NaN-fill path widens to F64. */
class GatherPropSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(graft.FuzzSeed(201614L))), p)
    assert(res.passed, res.status.toString)
  }

  private val caseGen = for {
    n <- Gen.chooseNum(2, 10)
    chunk <- Gen.chooseNum(1, n)
    seed <- Gen.chooseNum(0, 1000)
  } yield (n, chunk, seed)

  private def mkDs(n: Int, chunk: Int, seed: Int, labels: Array[Double]) = {
    val vals = Array.tabulate(n)(i => ((i * 31 + seed) % 101).toLong - 50)
    (vals, XbeamDataset.fromLocal(spark,
      Map("iv" -> (Seq("t"),
        NdArray.fromLongs(DType.I64, Array(n), vals))),
      coords = Map("t" -> NdArray.fromDoubles(DType.F64, Array(n), labels)),
      chunks = Map("t" -> chunk)))
  }

  test("reindex on random hit/miss label mixes matches the naive lookup") {
    val g = for {
      base <- caseGen
      m <- Gen.chooseNum(1, 12)
      picks <- Gen.listOfN(m, for {
        hit <- Gen.oneOf(true, false)
        j <- Gen.chooseNum(0, 1000)
      } yield (hit, j))
    } yield (base, picks)
    check(Prop.forAllNoShrink(g) { case ((n, chunk, seed), picks) =>
      // labels are a shuffled permutation of 0..n-1 (times 2, so
      // odd targets are guaranteed misses)
      val labels = new scala.util.Random(seed).shuffle(
        (0 until n).toList).map(_ * 2.0).toArray
      val (vals, ds) = mkDs(n, chunk, seed, labels)
      val targets = picks.map { case (hit, j) =>
        if (hit) labels(j % n) else j * 2 + 1.0
      }.toArray
      val out = ds.reindex("t", targets)
      val got = out.collectConsolidated()._2.vars("iv").arr
      val allHit = picks.forall(_._1)
      val dtypeOk = got.dtype == (if (allHit) DType.I64 else DType.F64)
      val valsOk = targets.indices.forall { k =>
        val src = labels.indexOf(targets(k))
        val gv = got.getDouble(k.toLong)
        if (src >= 0) gv == vals(src).toDouble else gv.isNaN
      }
      (dtypeOk && valsOk) :|
        s"n=$n chunk=$chunk labels=${labels.toSeq} targets=${targets.toSeq} " +
          s"got=${got.toDoubles.toSeq} dtype=${got.dtype}"
    }, n = 30)
  }

  test("sortby on random unique labels matches a naive argsort, both ways") {
    check(Prop.forAllNoShrink(caseGen) { case (n, chunk, seed) =>
      val labels = new scala.util.Random(seed + 7).shuffle(
        (0 until n).toList).map(_.toDouble).toArray
      val (vals, ds) = mkDs(n, chunk, seed, labels)
      val ascIdx = labels.zipWithIndex.sortBy(_._1).map(_._2)
      val asc = ds.sortby("t")
      val desc = ds.sortby("t", descending = true)
      val gotA = asc.collectConsolidated()._2.vars("iv").arr
      val gotD = desc.collectConsolidated()._2.vars("iv").arr
      val okA = ascIdx.indices.forall(k =>
        gotA.getLong(k.toLong) == vals(ascIdx(k)))
      val okD = ascIdx.indices.forall(k =>
        gotD.getLong(k.toLong) == vals(ascIdx(n - 1 - k)))
      // dtype preserved on the all-resolved path; sorted coord emitted
      val coordOk = asc.template.coords("t").toDoubles.toSeq ==
        labels.sorted.toSeq
      (gotA.dtype == DType.I64 && okA && okD && coordOk) :|
        s"n=$n chunk=$chunk labels=${labels.toSeq} " +
          s"asc=${gotA.toDoubles.toSeq} desc=${gotD.toDoubles.toSeq}"
    }, n = 30)
  }

  test("isel on random positions (repeats, reorders) matches the naive take") {
    val g = for {
      base <- caseGen
      m <- Gen.chooseNum(1, 15)
      raw <- Gen.listOfN(m, Gen.chooseNum(0, 1000))
    } yield (base, raw)
    check(Prop.forAllNoShrink(g) { case ((n, chunk, seed), raw) =>
      val labels = Array.tabulate(n)(_ * 2.0)
      val (vals, ds) = mkDs(n, chunk, seed, labels)
      val positions = raw.map(j => (j % n).toLong).toArray
      val out = ds.isel("t", positions)
      val got = out.collectConsolidated()._2.vars("iv").arr
      val expVals = positions.map(p => vals(p.toInt).toDouble).toSeq
      val expCoord = positions.map(p => labels(p.toInt)).toSeq
      (got.dtype == DType.I64 &&
        got.toDoubles.toSeq == expVals &&
        out.template.coords("t").toDoubles.toSeq == expCoord) :|
        s"n=$n chunk=$chunk positions=${positions.toSeq} " +
          s"got=${got.toDoubles.toSeq} exp=$expVals"
    }, n = 40)
  }

  test("isel adversarial patterns: all-same, reverse, sawtooth, boundary runs, k-fold") {
    // structured worst cases the uniform-random fuzz rarely hits: one
    // source position fanned out m times (maximal sliver duplication),
    // a full reverse (every chunk reads every chunk), a 0/n-1 sawtooth
    // (alternating extreme chunks), runs of repeats pinned AT the chunk
    // boundary (the off-by-one hotspot), and k whole copies of the
    // identity (output larger than the source)
    val g = for {
      base <- caseGen
      kind <- Gen.chooseNum(0, 4)
      m <- Gen.chooseNum(1, 24)
    } yield (base, kind, m)
    check(Prop.forAllNoShrink(g) { case ((n, chunk, seed), kind, m) =>
      val labels = Array.tabulate(n)(_ * 2.0)
      val (vals, ds) = mkDs(n, chunk, seed, labels)
      val b = math.min(n - 1, chunk) // first boundary position (or end)
      val positions: Array[Long] = kind match {
        case 0 => Array.fill(m)((seed % n).toLong)
        case 1 => Array.tabulate(n)(i => (n - 1 - i).toLong)
        case 2 => Array.tabulate(m)(i => if (i % 2 == 0) 0L else (n - 1).toLong)
        case 3 => Array.tabulate(m)(i =>
          (math.max(0, b - 1) + i % 3).toLong).map(p => math.min(p, n - 1L))
        case _ => Array.tabulate(3 * n)(i => (i % n).toLong)
      }
      val out = ds.isel("t", positions)
      val got = out.collectConsolidated()._2.vars("iv").arr
      val expVals = positions.map(p => vals(p.toInt).toDouble).toSeq
      val expCoord = positions.map(p => labels(p.toInt)).toSeq
      (got.dtype == DType.I64 &&
        out.template.dimSizes("t") == positions.length.toLong &&
        got.toDoubles.toSeq == expVals &&
        out.template.coords("t").toDoubles.toSeq == expCoord) :|
        s"kind=$kind n=$n chunk=$chunk positions=${positions.toSeq} " +
          s"got=${got.toDoubles.toSeq} exp=$expVals"
    }, n = 60)
  }
}
