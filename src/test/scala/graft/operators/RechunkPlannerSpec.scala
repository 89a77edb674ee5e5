package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's Hypothesis properties for the rechunk
  * planner (rechunker_algorithm_test.py:188-197, 437-476), driven by a
  * seeded generator (deterministic, 200 cases per property). */
class RechunkPlannerSpec extends AnyFunSuite {

  private def cases[T](n: Int)(gen: scala.util.Random => T): Seq[T] = {
    val rng = new scala.util.Random(1234)
    Seq.fill(n)(gen(rng))
  }

  test("countIntermediateChunks matches brute force") {
    cases(300) { rng =>
      val size = 1L + rng.nextInt(120)
      val a = 1L + rng.nextLong(size)
      val b = 1L + rng.nextLong(size)
      (size, a, b)
    }.foreach { case (size, a, b) =>
      // brute force: distinct intervals cut by the union of both grids
      val cuts = (0L to size by a).toSet ++ (0L to size by b).toSet + size
      val sorted = cuts.toSeq.sorted
      val brute = sorted.sliding(2).count(w => w.length == 2 && w(1) > w(0))
      assert(RechunkPlanner.countIntermediateChunks(a, b, size) == brute,
        s"size=$size a=$a b=$b")
    }
  }

  test("multistagePlan: intermediates bounded by maxMem, stage chain contiguous") {
    cases(200) { rng =>
      val t = 20L + rng.nextInt(480)
      val x = 20L + rng.nextInt(180)
      val sc = 1L + rng.nextLong(t)
      val tc = 1L + rng.nextLong(t)
      (Vector(t, x), Vector(sc, x), Vector(tc, x))
    }.foreach { case (shape, src, tgt) =>
      val itemsize = 8L
      val maxMem = itemsize * shape.product // always feasible
      val plan = RechunkPlanner.multistagePlan(shape, src, tgt, itemsize,
        minMem = itemsize, maxMem = maxMem)
      assert(plan.stages.nonEmpty)
      assert(plan.stages.head.read == src.zip(shape).map { case (c, s) => math.min(c, s) }
        || plan.stages.head.read.zip(shape).forall { case (c, s) => c <= s })
      plan.stages.foreach { st =>
        assert(itemsize * st.intermediate.product <= maxMem,
          s"intermediate ${st.intermediate} exceeds maxMem for $shape $src $tgt")
        st.intermediate.indices.foreach { d =>
          assert(st.intermediate(d) >= 1)
          assert(st.intermediate(d) <= math.max(st.read(d), st.write(d)))
        }
      }
      plan.stages.sliding(2).foreach {
        case Seq(a, b) => assert(a.write == b.read, "stage chain must be contiguous")
        case _ =>
      }
    }
  }

  test("growChunks never exceeds maxMem and only grows within shape") {
    cases(200) { rng =>
      val s1 = 1L + rng.nextInt(100)
      val s2 = 1L + rng.nextInt(100)
      val c1 = 1L + rng.nextLong(s1)
      val c2 = 1L + rng.nextLong(s2)
      val mult = 1L + rng.nextInt(50)
      (Vector(s1, s2), Vector(c1, c2), mult)
    }.foreach { case (shape, chunks, mult) =>
      val itemsize = 4L
      val maxMem = itemsize * chunks.product * mult
      val grown = RechunkPlanner.growChunks(shape, chunks, itemsize, maxMem)
      assert(itemsize * grown.product <= maxMem)
      grown.indices.foreach { d =>
        assert(grown(d) >= chunks(d) && grown(d) <= shape(d))
      }
    }
  }

  test("reference-scale smoke: ERA5-ish pancake-to-pencil plan") {
    // time=350640, lat=721, lon=1440 f32; (31,721,1440) -> (350640,10,10)
    // with the reference defaults max_mem=2^30, min_mem=2^30/100
    // (rechunk.py:541,562) — the flagship 24.8 TB job's planning shape.
    val shape = Vector(350640L, 721L, 1440L)
    val src = Vector(31L, 721L, 1440L)
    val tgt = Vector(350640L, 10L, 10L)
    val plan = RechunkPlanner.multistagePlan(shape, src, tgt, 4L,
      minMem = (1L << 30) / 100, maxMem = 1L << 30)
    assert(plan.stages.nonEmpty)
    plan.stages.foreach { st =>
      assert(4L * st.intermediate.product <= (1L << 30))
    }
  }

  test("planForDims keeps dim names through every stage") {
    val stages = RechunkPlanner.planForDims(Seq("t", "x"),
      Map("t" -> 100L, "x" -> 50L), Map("t" -> 10, "x" -> 50),
      Map("t" -> 100, "x" -> 5), itemsize = 8, minMem = 8, maxMem = 1L << 20)
    assert(stages.nonEmpty)
    stages.foreach { case (r, i, w) =>
      assert(Set(r, i, w).forall(_.keySet == Set("t", "x")))
    }
  }
}
