package graft.api

import org.scalatest.funsuite.AnyFunSuite

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.ndarray.{DType, NdArray}

/** ScalaCheck fuzz over three distinct reduction machineries: exact
  * quantile (order statistics with numpy linear interpolation), ewm
  * (the affine-composition scan monoid), and coarsen trim/exact (block
  * reduce), each against a naive oracle on random chunkings. */
class ReducePropSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(graft.FuzzSeed(201617L))), p)
    assert(res.passed, res.status.toString)
  }

  private def mk1d(spark: org.apache.spark.sql.SparkSession, n: Int,
                   chunk: Int, vals: Array[Double]) =
    XbeamDataset.fromLocal(spark,
      Map("v" -> (Seq("t", "x"),
        NdArray.fromDoubles(DType.F64, Array(n, 2),
          Array.tabulate(2 * n)(i => vals(i / 2) + (i % 2))))),
      chunks = Map("t" -> chunk, "x" -> 2))

  test("quantile over t matches numpy linear interpolation per lane") {
    val g = for {
      n <- Gen.chooseNum(2, 12)
      chunk <- Gen.chooseNum(1, n)
      qk <- Gen.chooseNum(0, 8) // q in eighths incl. endpoints
      seed <- Gen.chooseNum(0, 1000)
    } yield (n, chunk, qk / 8.0, seed)
    check(Prop.forAllNoShrink(g) { case (n, chunk, q, seed) =>
      val vals = Array.tabulate(n)(i => (((i * 31 + seed) % 101) - 50) / 2.0)
      val ds = mk1d(spark, n, chunk, vals)
      val got = ds.quantile(q, Set("t"))
        .collectConsolidated()._2.vars("v").arr.toDoubles
      def naive(xs: Array[Double]): Double = {
        val s = xs.sorted
        val pos = q * (s.length - 1)
        val lo = math.floor(pos).toInt
        val hi = math.ceil(pos).toInt
        val w = pos - lo
        (1 - w) * s(lo) + w * s(hi)
      }
      val exp = Array(naive(vals), naive(vals.map(_ + 1)))
      (got.length == 2 && got.indices.forall(i =>
        math.abs(got(i) - exp(i)) < 1e-9)) :|
        s"n=$n chunk=$chunk q=$q got=${got.toSeq} exp=${exp.toSeq}"
    }, n = 40)
  }

  test("ewm matches the naive recursive unadjusted mean per lane") {
    val g = for {
      n <- Gen.chooseNum(2, 12)
      chunk <- Gen.chooseNum(1, n)
      ak <- Gen.chooseNum(1, 8) // alpha in eighths (dyadic — exact)
      seed <- Gen.chooseNum(0, 1000)
    } yield (n, chunk, ak / 8.0, seed)
    check(Prop.forAllNoShrink(g) { case (n, chunk, alpha, seed) =>
      val vals = Array.tabulate(n)(i => (((i * 31 + seed) % 101) - 50) / 2.0)
      val ds = mk1d(spark, n, chunk, vals)
      val got = ds.ewm("t", alpha)
        .collectConsolidated()._2.vars("v").arr.toDoubles
      def naive(xs: Array[Double]): Array[Double] = {
        val out = new Array[Double](xs.length)
        out(0) = xs(0)
        (1 until xs.length).foreach(i =>
          out(i) = (1 - alpha) * out(i - 1) + alpha * xs(i))
        out
      }
      val e0 = naive(vals)
      val e1 = naive(vals.map(_ + 1))
      val ok = (0 until n).forall { i =>
        math.abs(got(i * 2) - e0(i)) < 1e-9 &&
        math.abs(got(i * 2 + 1) - e1(i)) < 1e-9
      }
      ok :| s"n=$n chunk=$chunk alpha=$alpha got=${got.toSeq} " +
        s"exp=${e0.toSeq}/${e1.toSeq}"
    }, n = 40)
  }

  test("coarsen sum with exact/trim boundaries matches naive block sums") {
    val g = for {
      n <- Gen.chooseNum(2, 12)
      f <- Gen.chooseNum(2, 4)
      chunkMult <- Gen.chooseNum(1, 3)
      seed <- Gen.chooseNum(0, 1000)
      trim <- Gen.oneOf(false, true)
    } yield (n, f, chunkMult, seed, trim)
    check(Prop.forAllNoShrink(g) { case (n0, f, chunkMult, seed, trim) =>
      // exact boundary needs f | n; trim allows any tail
      val n = if (trim) n0 else (n0 / f).max(1) * f
      val vals = Array.tabulate(n)(i => (((i * 31 + seed) % 101) - 50) / 2.0)
      // coarsen requires chunk boundaries aligned to whole blocks
      // (factor | chunk), and normalizeChunks clamps chunks to the dim
      // size — so pick a whole-block chunk that fits
      val chunk = f * math.min(chunkMult, math.max(1, n / f))
      val ds = mk1d(spark, n, chunk, vals)
      // fewer positions than one block: the engine rejects loudly
      // ("no complete window") for BOTH boundaries — skip those
      if (n < f) Prop.passed
      else {
        val out = ds.coarsen(Map("t" -> f), "sum",
          boundary = if (trim) "trim" else "exact")
        val got = out.collectConsolidated()._2.vars("v").arr.toDoubles
        val blocks = n / f
        val exp0 = Array.tabulate(blocks)(b =>
          (0 until f).map(k => vals(b * f + k)).sum)
        val ok = got.length == 2 * blocks && (0 until blocks).forall { b =>
          math.abs(got(b * 2) - exp0(b)) < 1e-9 &&
          math.abs(got(b * 2 + 1) - (exp0(b) + f)) < 1e-9
        }
        ok :| s"n=$n f=$f chunk=$chunk trim=$trim got=${got.toSeq} " +
          s"exp0=${exp0.toSeq}"
      }
    }, n = 40)
  }

  test("weightedQuantile matches the naive inverted CDF per lane") {
    val g = for {
      n <- Gen.chooseNum(2, 12)
      chunk <- Gen.chooseNum(1, n)
      qk <- Gen.chooseNum(0, 8)
      seed <- Gen.chooseNum(0, 1000)
      nanAt <- Gen.chooseNum(-1, 11) // -1 = no NaN; else position % n
    } yield (n, chunk, qk / 8.0, seed, nanAt)
    check(Prop.forAllNoShrink(g) { case (n, chunk, q, seed, nanAt) =>
      val vals = Array.tabulate(n) { i =>
        if (nanAt >= 0 && nanAt % n == i) Double.NaN
        else (((i * 37 + seed) % 23) - 11).toDouble // ties likely
      }
      val wts = Array.tabulate(n)(i => ((i * 13 + seed) % 5 + 1).toDouble)
      val ds = mk1d(spark, n, chunk, vals)
      val w = NdArray.fromDoubles(DType.F64, Array(n), wts)
      val got = ds.weightedQuantile(q, Set("t"), Map("t" -> w))
        .collectConsolidated()._2.vars("v").arr.toDoubles
      def naive(xs: Array[Double]): Double = {
        val pairs = xs.zip(wts).filterNot(_._1.isNaN).sortBy(_._1)
        val total = pairs.map(_._2).sum
        if (pairs.isEmpty || total <= 0) Double.NaN
        else {
          var cum = 0.0
          pairs.find { p => cum += p._2; cum >= q * total }
            .getOrElse(pairs.last)._1
        }
      }
      val exp = Array(naive(vals), naive(vals.map(_ + 1)))
      (got.length == 2 && got.indices.forall(i =>
        got(i) == exp(i) || (got(i).isNaN && exp(i).isNaN))) :|
        s"n=$n chunk=$chunk q=$q nanAt=$nanAt got=${got.toSeq} " +
          s"exp=${exp.toSeq}"
    }, n = 60)
  }

  test("weightedTrend matches the naive weighted-moment formula per lane") {
    val g = for {
      n <- Gen.chooseNum(2, 12)
      chunk <- Gen.chooseNum(1, n)
      seed <- Gen.chooseNum(0, 1000)
    } yield (n, chunk, seed)
    check(Prop.forAllNoShrink(g) { case (n, chunk, seed) =>
      val vals = Array.tabulate(n)(i => (((i * 41 + seed) % 19) - 9).toDouble)
      val wts = Array.tabulate(n)(i => ((i * 7 + seed) % 4).toDouble) // 0s ok
      val ds = mk1d(spark, n, chunk, vals)
      val w = NdArray.fromDoubles(DType.F64, Array(n), wts)
      val got = ds.weightedTrend("t", w)
        .collectConsolidated()._2.vars("v").arr.toDoubles
      def naive(xs: Array[Double]): Double = {
        var sw = 0.0; var swt = 0.0; var swt2 = 0.0
        var swv = 0.0; var swtv = 0.0
        xs.indices.foreach { i =>
          val wv = wts(i); val t = i.toDouble
          sw += wv; swt += wv * t; swt2 += wv * t * t
          swv += wv * xs(i); swtv += wv * t * xs(i)
        }
        val denom = sw * swt2 - swt * swt
        if (denom == 0) Double.NaN else (sw * swtv - swt * swv) / denom
      }
      val exp = Array(naive(vals), naive(vals.map(_ + 1)))
      (got.length == 2 && got.indices.forall(i =>
        got(i) == exp(i) || (got(i).isNaN && exp(i).isNaN))) :|
        s"n=$n chunk=$chunk got=${got.toSeq} exp=${exp.toSeq} " +
          s"wts=${wts.toSeq}"
    }, n = 60)
  }

  test("resampleUpsample matches naive grid fills for random steps/offsets") {
    val HOUR = 3600L * 1000000000L
    val DAY = 24 * HOUR
    val base = java.time.Instant.parse("2022-06-01T00:00:00Z")
      .getEpochSecond * 1000000000L
    val g = for {
      n <- Gen.chooseNum(2, 10)
      chunk <- Gen.chooseNum(1, n)
      stepH <- Gen.chooseNum(25, 49) // > 1 day: genuine upsample
      offH <- Gen.chooseNum(0, 23)   // unaligned starts too
      method <- Gen.oneOf("ffill", "bfill", "nearest", "linear")
      seed <- Gen.chooseNum(0, 1000)
    } yield (n, chunk, stepH, offH, method, seed)
    check(Prop.forAllNoShrink(g) { case (n, chunk, stepH, offH, method, seed) =>
      val times = Array.tabulate(n)(i => base + offH * HOUR + i * stepH * HOUR)
      val vals = Array.tabulate(n)(i => (((i * 29 + seed) % 37) - 18).toDouble)
      val ds = XbeamDataset.fromLocal(spark,
        Map("v" -> (Seq("t"), NdArray.fromDoubles(DType.F64, Array(n), vals))),
        coords = Map("t" -> NdArray.fromLongs(DType.TimeNs, Array(n), times)),
        chunks = Map("t" -> chunk))
      val lo = times.head
      val hi = times.last
      val start =
        if (method == "linear") -Math.floorDiv(-lo, DAY) * DAY
        else Math.floorDiv(lo, DAY) * DAY
      val targets = Iterator.iterate(start)(_ + DAY).takeWhile(_ <= hi).toArray
      if (targets.isEmpty)
        Prop(true) // engine requires >= 1 target; nothing to compare
      else {
        val got = ds.resampleUpsample("t", "day", method)
          .collectConsolidated()._2.vars("v").arr.toDoubles
        def naive(tc: Long): Double = method match {
          case "ffill" =>
            val i = times.lastIndexWhere(_ <= tc)
            if (i < 0) Double.NaN else vals(i)
          case "bfill" =>
            val i = times.indexWhere(_ >= tc)
            if (i < 0) Double.NaN else vals(i)
          case "nearest" =>
            val i = times.indices.minBy(i =>
              (math.abs(times(i) - tc), times(i))) // ties take lower label
            vals(i)
          case "linear" =>
            val j = times.indexWhere(_ >= tc)
            if (times(j) == tc) vals(j)
            else {
              val w = (tc - times(j - 1)).toDouble /
                (times(j) - times(j - 1)).toDouble
              vals(j - 1) + w * (vals(j) - vals(j - 1))
            }
        }
        val exp = targets.map(naive)
        (got.length == exp.length && got.indices.forall(i =>
          got(i) == exp(i) || (got(i).isNaN && exp(i).isNaN) ||
            math.abs(got(i) - exp(i)) < 1e-12)) :|
          s"n=$n chunk=$chunk step=${stepH}h off=${offH}h method=$method " +
            s"got=${got.toSeq} exp=${exp.toSeq}"
      }
    }, n = 60)
  }

  test("weightedPolyfit deg>=3 recovers exact polynomials; rank-deficient NaN") {
    // the pivoted-elimination extract path (deg >= 3) with weights:
    // values sit EXACTLY on an integer polynomial, so any weighting
    // with >= deg+1 NONZERO-weight positions forms a consistent system
    // that must recover the coefficients; fewer nonzero-weight points
    // must NaN via the rank plane (the FP determinant of a singular
    // weighted system is rounding noise, never exactly 0)
    val g = for {
      deg <- Gen.chooseNum(3, 4)
      n <- Gen.chooseNum(deg + 2, 10)
      chunk <- Gen.chooseNum(1, n)
      coefs <- Gen.listOfN(deg + 1, Gen.chooseNum(-3, 3))
      weights <- Gen.listOfN(n, Gen.frequency(
        2 -> Gen.const(0), 3 -> Gen.chooseNum(1, 3)))
    } yield (deg, n, chunk, coefs.toArray, weights.toArray)
    check(Prop.forAllNoShrink(g) { case (deg, n, chunk, coefs, weights) =>
      val vals = Array.tabulate(n) { i =>
        var acc = 0.0; var p = 1.0
        coefs.foreach { c => acc += c * p; p *= i }
        acc
      }
      // two lanes: lane 1 shifts the constant term by +1 — still an
      // exact polynomial, same higher coefficients
      val ds = mk1d(spark, n, chunk, vals)
      val w = NdArray.fromDoubles(DType.F64, Array(n), weights.map(_.toDouble))
      val out = ds.weightedPolyfit("t", deg, w)
        .collectConsolidated()._2.vars("v").arr
      val nz = weights.count(_ != 0)
      if (nz < deg + 1)
        out.toDoubles.forall(_.isNaN) :|
          s"deg=$deg nz=$nz expected all-NaN, got ${out.toDoubles.toSeq}"
      else {
        // plane k lane j at k*2+j; plane k = coefficient of t^(deg-k)
        val ok = (0 to deg).forall { k =>
          val c = coefs(deg - k)
          val want0 = c.toDouble
          val want1 = if (k == deg) c + 1.0 else c.toDouble
          math.abs(out.getDouble(k * 2L) - want0) < 1e-5 &&
            math.abs(out.getDouble(k * 2L + 1) - want1) < 1e-5
        }
        ok :| s"deg=$deg n=$n chunk=$chunk coefs=${coefs.toSeq} " +
          s"wts=${weights.toSeq} got=${out.toDoubles.toSeq}"
      }
    }, n = 50)
  }

  test("curvefitExp recovers random planted exponentials under NaN holes") {
    // randomized version of the planted-recovery spec: random (a, b)
    // per lane, random chunking, random NaN holes — the fit must
    // recover the parameters wherever >= 2 valid points remain and
    // NaN otherwise, identically at every chunking (the cell
    // consolidation hands the solver the same bytes)
    val g = for {
      n <- Gen.chooseNum(4, 14)
      chunk <- Gen.chooseNum(1, n)
      a8 <- Gen.chooseNum(1, 32)   // a in eighths: 0.125 .. 4
      b100 <- Gen.chooseNum(-30, 30) // b in hundredths: -0.3 .. 0.3
      holes <- Gen.listOfN(n, Gen.frequency(4 -> false, 1 -> true))
    } yield (n, chunk, a8 / 8.0, b100 / 100.0, holes.toArray)
    check(Prop.forAllNoShrink(g) { case (n, chunk, a, b, holes) =>
      val vals = Array.tabulate(n)(i =>
        if (holes(i)) Double.NaN else a * math.exp(b * i))
      val valid = vals.count(!_.isNaN)
      val ds = XbeamDataset.fromLocal(spark,
        Map("v" -> (Seq("t"), NdArray.fromDoubles(DType.F64, Array(n), vals))),
        chunks = Map("t" -> chunk))
      val c = ds.curvefitExp("t").collectConsolidated()._2
      val ga = c.vars("v_cf_a").arr.getDouble(0L)
      val gb = c.vars("v_cf_b").arr.getDouble(0L)
      val ok =
        if (valid < 2) ga.isNaN && gb.isNaN
        else math.abs(ga - a) < 1e-7 * math.max(1, a) &&
          math.abs(gb - b) < 1e-7
      ok :| s"n=$n chunk=$chunk a=$a b=$b valid=$valid got=($ga, $gb)"
    }, n = 60)
  }

  test("curvefitLogistic/Gaussian recover random planted curves under NaN holes") {
    // the 3-parameter siblings of the exp property: random planted
    // (L, k, t0) sigmoids and (a, mu, sigma) peaks with random NaN
    // holes and chunkings. The shape parameters are drawn so the curve
    // stays identifiable over [0, n): transition/peak mid-series,
    // width a fraction of the extent. Recovery within 1e-5 relative
    // wherever >= 3 valid points remain; NaN triple otherwise.
    val g = for {
      n <- Gen.chooseNum(24, 48)
      chunk <- Gen.chooseNum(1, 48)
      amp8 <- Gen.chooseNum(8, 48)       // amplitude 1 .. 6
      mid <- Gen.chooseNum(40, 60)       // center at 40-60% of n
      width <- Gen.chooseNum(12, 25)     // width = n/100*width*...
      holes <- Gen.listOfN(48, Gen.frequency(9 -> false, 1 -> true))
      gauss <- Gen.oneOf(true, false)
    } yield (n, math.min(chunk, n), amp8 / 8.0, mid, width, holes.toArray, gauss)
    check(Prop.forAllNoShrink(g) { case (n, chunk, amp, mid, width, holes, gauss) =>
      val t0 = n * mid / 100.0
      val w = n * width / 100.0 // sigma, or 1/k scale
      val vals = Array.tabulate(n) { i =>
        if (holes(i)) Double.NaN
        else if (gauss) amp * math.exp(-(i - t0) * (i - t0) / (2 * w * w))
        else amp / (1.0 + math.exp(-(4.0 / w) * (i - t0)))
      }
      val valid = vals.count(!_.isNaN)
      val ds = XbeamDataset.fromLocal(spark,
        Map("v" -> (Seq("t"), NdArray.fromDoubles(DType.F64, Array(n), vals))),
        chunks = Map("t" -> chunk))
      val c = (if (gauss) ds.curvefitGaussian("t") else ds.curvefitLogistic("t"))
        .collectConsolidated()._2
      val p1 = c.vars(if (gauss) "v_cf_a" else "v_cf_l").arr.getDouble(0L)
      val p2 = c.vars(if (gauss) "v_cf_mu" else "v_cf_t0").arr.getDouble(0L)
      val p3 = c.vars(if (gauss) "v_cf_sigma" else "v_cf_k").arr.getDouble(0L)
      val want3 = if (gauss) w else 4.0 / w
      val ok =
        if (valid < 3) p1.isNaN && p2.isNaN && p3.isNaN
        else math.abs(p1 - amp) < 1e-5 * amp &&
          math.abs(p2 - t0) < 1e-5 * math.max(1, t0) &&
          math.abs(p3 - want3) < 1e-5 * want3
      ok :| s"gauss=$gauss n=$n chunk=$chunk amp=$amp t0=$t0 w=$w " +
        s"valid=$valid got=($p1, $p2, $p3)"
    }, n = 60)
  }

  test("rollingNd mean/var match naive rectangle moments on random grids") {
    val g = for {
      nt <- Gen.chooseNum(2, 8)
      nx <- Gen.chooseNum(2, 6)
      wt0 <- Gen.chooseNum(2, 4)
      wx <- Gen.chooseNum(2, 3)
      chunk0 <- Gen.chooseNum(1, 8)
      minP <- Gen.chooseNum(1, 4)
      op <- Gen.oneOf("mean", "var", "std")
      seed <- Gen.chooseNum(0, 1000)
      holes <- Gen.listOfN(48, Gen.frequency(5 -> false, 1 -> true))
    } yield {
      // the halo exchange's documented precondition: window-1 slivers
      // come from the immediate neighbor, so chunk >= window-1
      val wt = math.min(wt0, nt)
      val chunk = math.max(math.min(chunk0, nt), wt - 1)
      (nt, nx, wt, wx, chunk, minP, op, seed, holes)
    }
    check(Prop.forAllNoShrink(g) {
      case (nt, nx, wt, wx, chunk, minP, op, seed, holes) =>
        val vals = NdArray.zeros(DType.F64, Array(nt, nx))
        for (t <- 0 until nt; x <- 0 until nx)
          vals.setDouble(t.toLong * nx + x,
            if (holes((t * nx + x) % 48)) Double.NaN
            else (((t * nx + x) * 31 + seed) % 101 - 50) / 2.0)
        val ds = XbeamDataset.fromLocal(spark,
          Map("v" -> (Seq("t", "x"), vals)), chunks = Map("t" -> chunk))
        val got = ds.rollingNd(Map("t" -> wt, "x" -> wx), op, minP)
          .collectConsolidated()._2.vars("v").arr
        var ok = true
        var msg = ""
        for (t <- 0 until nt; x <- 0 until nx) {
          val w = (math.max(0, t - wt + 1) to t).flatMap(tt =>
            (math.max(0, x - wx + 1) to x).map(xx =>
              vals.getDouble(tt.toLong * nx + xx))).filterNot(_.isNaN)
          val want =
            if (w.length < minP || w.isEmpty) Double.NaN
            else {
              val m = w.sum / w.length
              op match {
                case "mean" => m
                case "var" =>
                  val v = w.map(v => v * v).sum / w.length - m * m
                  if (v < 0) 0.0 else v
                case _ =>
                  val v = w.map(v => v * v).sum / w.length - m * m
                  math.sqrt(if (v < 0) 0.0 else v)
              }
            }
          val gv = got.getDouble(t.toLong * nx + x)
          if (!((gv.isNaN && want.isNaN) || math.abs(gv - want) < 1e-10)) {
            ok = false
            msg = s"t=$t x=$x got=$gv want=$want"
          }
        }
        ok :| s"nt=$nt nx=$nx wt=$wt wx=$wx chunk=$chunk minP=$minP " +
          s"op=$op $msg"
    }, n = 50)
  }

  test("resampleQuantile matches naive per-day order statistics at ragged boundaries") {
    // sample spacing of 5-40 hours crosses day boundaries raggedly:
    // periods hold 1..5 samples, some days are skipped entirely —
    // the bucket machinery must group by period start, not position
    val HOUR = 3600L * 1000000000L
    val DAY = 24 * HOUR
    val base = java.time.Instant.parse("2021-03-01T00:00:00Z")
      .getEpochSecond * 1000000000L
    val g = for {
      n <- Gen.chooseNum(3, 14)
      chunk <- Gen.chooseNum(1, n)
      stepH <- Gen.chooseNum(5, 40)
      offH <- Gen.chooseNum(0, 47)
      qk <- Gen.chooseNum(0, 4)
      seed <- Gen.chooseNum(0, 1000)
    } yield (n, chunk, stepH, offH, qk / 4.0, seed)
    check(Prop.forAllNoShrink(g) { case (n, chunk, stepH, offH, q, seed) =>
      val times = Array.tabulate(n)(i => base + (offH + i.toLong * stepH) * HOUR)
      val vals = Array.tabulate(n)(i => (((i * 31 + seed) % 101) - 50) / 2.0)
      val ds = XbeamDataset.fromLocal(spark,
        Map("v" -> (Seq("t"), NdArray.fromDoubles(DType.F64, Array(n), vals))),
        coords = Map("t" -> NdArray.fromLongs(DType.TimeNs, Array(n), times)),
        chunks = Map("t" -> chunk))
      val out = ds.resampleQuantile("t", "day", q)
      val gotCoord = out.template.coords("t").toLongs
      val got = out.collectConsolidated()._2.vars("v").arr.toDoubles
      val byDay = times.indices.groupBy(i => Math.floorDiv(times(i), DAY))
        .toSeq.sortBy(_._1)
      def naive(xs: Seq[Double]): Double = {
        val s = xs.sorted
        val pos = q * (s.length - 1)
        val lo = math.floor(pos).toInt
        val hi = math.ceil(pos).toInt
        val w = pos - lo
        (1 - w) * s(lo) + w * s(hi)
      }
      val expCoord = byDay.map(_._1 * DAY)
      val exp = byDay.map { case (_, idx) => naive(idx.map(vals)) }
      (gotCoord.toSeq == expCoord &&
        got.length == exp.length &&
        got.indices.forall(i => math.abs(got(i) - exp(i)) < 1e-9)) :|
        s"n=$n chunk=$chunk step=${stepH}h off=${offH}h q=$q " +
          s"gotCoord=${gotCoord.toSeq} expCoord=$expCoord " +
          s"got=${got.toSeq} exp=$exp"
    }, n = 50)
  }
}
