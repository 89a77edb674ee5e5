package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.Fixtures.arange
import graft.api.XbeamDataset
import graft.ndarray.DType
import graft.sources.zarr.{ChunkStats, ZarrScanBuilder}

/** Chunk-stats zone maps: written in the same pass as toZarr, used by
  * the DSv2 scan to prune chunks on data-variable predicates, and
  * invalidated by every mutation path. */
class ZarrStatsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** (t=24, x=4) store, v = global linear index (monotone in C-order),
    * chunked t->4 => 6 chunks, each covering 16 consecutive values. */
  private def statsStore(stats: Boolean = true): String = {
    val dir = Files.createTempDirectory("zarr_stats").toString + "/store"
    XbeamDataset.fromLocal(spark,
      Map("v" -> (Seq("t", "x"), arange(DType.F64, 24, 4)),
          "iv" -> (Seq("t", "x"), arange(DType.I64, 24, 4))),
      chunks = Map("t" -> 4)).toZarr(dir, stats = stats)
    dir
  }

  private def planned(dir: String, filters: org.apache.spark.sql.sources.Filter*): Int = {
    val b = new ZarrScanBuilder(dir)
    b.pushFilters(filters.toArray)
    b.build().toBatch.planInputPartitions().length
  }

  test("selective predicate prunes chunks; results stay exact") {
    val dir = statsStore()
    assert(ChunkStats.readIndex(dir).isDefined)
    // only the last of 6 chunks holds v >= 80
    assert(planned(dir) == 6)
    assert(planned(dir, GreaterThanOrEqual("v", 80.0)) == 1)
    assert(planned(dir, LessThan("v", 16.0)) == 1)
    // conjunction of var + var predicates intersects
    assert(planned(dir, GreaterThanOrEqual("v", 16.0), LessThan("v", 48.0)) == 2)
    // int var bounds prune too (conservative one-ulp widening keeps
    // the owning chunk)
    assert(planned(dir, GreaterThanOrEqual("iv", 80L)) == 1)
    // end-to-end: the residual filter keeps semantics exact
    val got = spark.read.format("zarr").load(dir)
      .filter(col("v") >= 80.0).orderBy("t", "x")
      .select("v").collect().map(_.getDouble(0))
    assert(got.toSeq == (80 until 96).map(_.toDouble))
  }

  test("without stats nothing prunes (filters still push residually)") {
    val dir = statsStore(stats = false)
    assert(ChunkStats.readIndex(dir).isEmpty)
    assert(planned(dir, GreaterThanOrEqual("v", 80.0)) == 6)
  }

  test("extendDim tombstones the sidecar; scan falls back to all chunks") {
    val dir = statsStore()
    Zarr.extendDim(dir, "t", 28)
    assert(ChunkStats.readIndex(dir).isEmpty)
    assert(planned(dir, GreaterThanOrEqual("v", 80.0)) == 7)
  }

  test("append path (needsSetup=false) tombstones before writing") {
    val dir = statsStore()
    // overwrite-in-place append: same grid, new values — recorded
    // bounds would lie, so the append must tombstone the sidecar
    XbeamDataset.fromLocal(spark,
      Map("v" -> (Seq("t", "x"), arange(DType.F64, 24, 4)),
          "iv" -> (Seq("t", "x"), arange(DType.I64, 24, 4))),
      chunks = Map("t" -> 4)).toZarr(dir, needsSetup = false)
    assert(ChunkStats.readIndex(dir).isEmpty)
  }

  test("grid-mismatched sidecar is ignored, not trusted") {
    val dir = statsStore()
    // tamper: claim the stats were computed on a different grid
    val idx = ChunkStats.indexUrl(dir)
    val store = BlobStore.forUrl(dir)
    val json = new String(store.read(idx), "UTF-8")
    store.write(idx, json.replace("\"grid\":[6,1]", "\"grid\":[3,1]").getBytes("UTF-8"))
    assert(planned(dir, GreaterThanOrEqual("v", 80.0)) == 6)
  }

  test("conservative Long->Double endpoints beyond 2^53") {
    val big = (1L << 60) + 1
    assert(BigDecimal(ChunkStats.floorDouble(big)) <= BigDecimal(big))
    assert(BigDecimal(ChunkStats.ceilDouble(big)) >= BigDecimal(big))
    assert(ChunkStats.floorDouble(42L) == 42.0)
    assert(ChunkStats.ceilDouble(-42L) == -42.0)
    assert(BigDecimal(ChunkStats.floorDouble(Long.MaxValue)) <= BigDecimal(Long.MaxValue))
    assert(BigDecimal(ChunkStats.ceilDouble(Long.MinValue)) >= BigDecimal(Long.MinValue))
  }
}
