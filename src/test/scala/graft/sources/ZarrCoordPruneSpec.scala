package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{GreaterThan, GreaterThanOrEqual, LessThanOrEqual}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.Fixtures.arange
import graft.api.XbeamDataset
import graft.ndarray.{DType, NdArray}
import graft.sources.zarr.ZarrScanBuilder

/** Coordinate-predicate chunk pruning on the DSv2 scan: predicates on
  * `<dim>_coord` columns prune chunks at plan time from the stored
  * coordinate array, comparing in the coordinate's own value space —
  * nanosecond timestamps sit far beyond 2^53, where a double
  * round-trip would collapse neighbouring values. */
class ZarrCoordPruneSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // 2020-01-01T00:00:00Z in epoch NANOS (~1.58e18, double ulp = 256)
  private val baseNs = 1577836800L * 1000000000L

  /** (t=24, x=4) store, chunks t->4 => 6 chunks; time coordinate steps
    * ONE NANOSECOND per index, so neighbouring chunk boundaries are
    * indistinguishable after a double round-trip. */
  private def coordStore(): String = {
    val dir = Files.createTempDirectory("zarr_coord").toString + "/store"
    val xds = XbeamDataset.fromLocal(spark,
      Map("v" -> (Seq("t", "x"), arange(DType.F64, 24, 4))),
      chunks = Map("t" -> 4))
    val timeCoord = NdArray.fromLongs(DType.TimeNs, Array(24),
      Array.tabulate(24)(i => baseNs + i))
    XbeamDataset.fromPairs(spark,
      xds.template.copy(coords = Map("t" -> timeCoord)),
      xds.chunkSizes, xds.chunkDataset, validate = false).toZarr(dir)
    dir
  }

  private def planned(dir: String, filters: org.apache.spark.sql.sources.Filter*): Int = {
    val b = new ZarrScanBuilder(dir, coords = true)
    b.pushFilters(filters.toArray)
    b.build().toBatch.planInputPartitions().length
  }

  test("nanosecond-exact range pruning (would mis-prune as doubles)") {
    val dir = coordStore()
    assert(planned(dir) == 6)
    // values baseNs..baseNs+3 live only in chunk 0; as doubles,
    // baseNs+3 == baseNs == chunk 1's min (ulp 256), so a double-space
    // comparison could not separate the chunks
    assert(planned(dir, LessThanOrEqual("t_coord", baseNs + 3)) == 1)
    assert(planned(dir, GreaterThanOrEqual("t_coord", baseNs + 20)) == 1)
    // conjunction intersects: values +4..+11 = chunks 1 and 2
    assert(planned(dir,
      GreaterThanOrEqual("t_coord", baseNs + 4),
      LessThanOrEqual("t_coord", baseNs + 11)) == 2)
    // empty range plans zero partitions
    assert(planned(dir, GreaterThan("t_coord", baseNs + 23)) == 0)
  }

  test("end-to-end rows stay exact under the residual filter") {
    val dir = coordStore()
    val got = spark.read.format("zarr").option("coords", "true").load(dir)
      .filter(col("t_coord") <= baseNs + 3)
      .orderBy("t", "x")
      .select("t", "v").collect()
    assert(got.length == 16) // t in 0..3, x in 0..3
    assert(got.map(_.getDouble(1)).toSeq == (0 until 16).map(_.toDouble))
  }

  test("dim-index and coordinate pruning compose") {
    val dir = coordStore()
    import org.apache.spark.sql.sources.LessThan
    // t < 12 keeps chunks 0-2; coord >= baseNs+8 keeps chunks 2-5
    assert(planned(dir, LessThan("t", 12L),
      GreaterThanOrEqual("t_coord", baseNs + 8)) == 1)
  }
}
