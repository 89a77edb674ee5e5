package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the planner — ports of the reference's Hypothesis
  * properties (rechunker_algorithm_test.py:188-209, 437-512), run over
  * seeded random case streams (the scalatest/scalacheck bridge is not
  * in the offline cache, so sampling is explicit). */
class RechunkPlannerPropSpec extends AnyFunSuite {

  test("singleStageIoOps counts distinct (source,target) block pairs " +
       "(rechunker_algorithm_test.py:188-209)") {
    val rng = new scala.util.Random(1234)
    (1 to 500).foreach { _ =>
      val size = 1L + rng.nextInt(1000)
      val source = 1L + rng.nextInt(1000)
      val target = 1L + rng.nextInt(1000)
      val calculated = RechunkPlanner.singleStageIoOps(
        Vector(size), Vector(source), Vector(target))
      val actual = (0L until size).map(i => (i / source, i / target)).distinct.size
      assert(calculated == actual.toLong,
        s"size=$size source=$source target=$target")
    }
  }

  test("multistagePlan always yields valid memory-bounded stages " +
       "(rechunker_algorithm_test.py:437-512)") {
    val itemsize = 4L
    val rng = new scala.util.Random(4242)
    (1 to 300).foreach { _ =>
      val ndim = 1 + rng.nextInt(4)
      val dims = Vector.fill(ndim) {
        val sh = 1L + rng.nextInt(10000)
        val sc = 1L + (rng.nextDouble() * sh).toLong.min(sh - 1)
        val tc = 1L + (rng.nextDouble() * sh).toLong.min(sh - 1)
        (sh, sc, tc)
      }
      val shape = dims.map(_._1)
      val source = dims.map(_._2)
      val target = dims.map(_._3)
      val origMem = itemsize * math.max(source.product, target.product)
      val maxMem = origMem * 10
      val minMem = math.min(
        math.min(itemsize * math.max(shape.product / 4, 1), 5 * origMem), maxMem)
      val clue = s"shape=$shape source=$source target=$target " +
        s"minMem=$minMem maxMem=$maxMem"
      val plan = RechunkPlanner.multistagePlan(
        shape, source, target, itemsize, minMem, maxMem)
      val stages = plan.stages
      assert(stages.nonEmpty, clue)
      // first read covers source; last write covers + evenly slices target
      source.zip(stages.head.read).foreach { case (sc, rc) =>
        assert(rc >= sc, clue)
      }
      shape.indices.foreach { d =>
        val wc = stages.last.write(d)
        assert(wc >= target(d), clue)
        assert(wc == shape(d) || wc % target(d) == 0, clue)
      }
      stages.foreach { st =>
        assert(st.read.length == shape.length && st.write.length == shape.length, clue)
        assert(itemsize * st.read.product <= maxMem, clue)
        assert(itemsize * st.intermediate.product <= maxMem, clue)
        assert(itemsize * st.write.product <= maxMem, clue)
        assert(minMem <= itemsize * st.read.product, clue)
        assert(minMem <= itemsize * st.write.product, clue)
        if (plan.excessiveIo)
          assert(itemsize * st.intermediate.product <= minMem, clue)
        else
          assert(minMem <= itemsize * st.intermediate.product, clue)
        st.read.indices.foreach { d =>
          assert(st.intermediate(d) == math.min(st.read(d), st.write(d)), clue)
        }
      }
    }
  }

  test("pangeo rechunker issue 115 regression (rechunker_algorithm_test.py:513+)") {
    val plan = RechunkPlanner.multistagePlan(
      Vector(175320L, 721L, 1440L), Vector(24L, 721L, 1440L),
      Vector(21915L, 103L, 10L), itemsize = 4,
      minMem = 4, maxMem = 12000000000L)
    plan.stages.foreach { st =>
      assert(4L * st.read.product <= 12000000000L)
      assert(4L * st.write.product <= 12000000000L)
    }
  }
}
