package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Physical-plan shape assertions for the scale-critical queries: these
  * pin the 100 TB posture (equi-joins, broadcasts, no nested-loop pair
  * joins), not just result correctness. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("d06 banded simhash: equi-join on band values, no quadratic join") {
    val plan = planOf("d06_simhash_neardup_pairs")
    assert(!plan.contains("CartesianProduct"),
      "banded candidate generation must not cross-join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "banded candidate generation must not nested-loop-join")
  }

  test("e08 k-means: centroids broadcast; assignment aggregates partially") {
    val plan = planOf("e08_kmeans")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "centroid join must broadcast the 8-row side")
    assert(plan.contains("partial_min") || plan.contains("partial"),
      "argmin must aggregate map-side before the shuffle")
  }

  test("q02 filter pushdown reaches the parquet scan") {
    val plan = planOf("q02_filter_pushdown")
    assert(plan.contains("PushedFilters: [") &&
      plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)].*", "$1").nonEmpty,
      "dim predicates must reach the parquet reader")
  }
}
