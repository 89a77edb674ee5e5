package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.api.XbeamDataset
import graft.ndarray.{DType, NdArray}

/** ScalaCheck fuzz of the core store IO path: random dtype x shape x
  * chunk grid x compressor x format (x shards on v3) through
  * toZarr -> fromZarr -> collect must be byte-identical to the source.
  * Every generated case respects the writer's alignment contract
  * (in-memory chunks are whole multiples of the zarr write unit), so a
  * failure here is a real codec/layout bug, never a validation error. */
class ZarrRoundtripPropSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("random store roundtrips are identity (v2+v3, codecs, shards)") {
    val dtypeGen = Gen.oneOf(DType.F64, DType.F32, DType.I64, DType.I32,
      DType.I16, DType.I8, DType.U8)
    val caseGen = for {
      dtype <- dtypeGen
      ndim <- Gen.chooseNum(1, 2)
      dims <- Gen.listOfN(ndim, for {
        inner <- Gen.chooseNum(1, 4)  // zarr chunk
        k <- Gen.chooseNum(1, 2)      // shard = inner * k
        m <- Gen.chooseNum(1, 2)      // mem chunk = shard * m
        nChunks <- Gen.chooseNum(1, 3)
        tail <- Gen.chooseNum(0, inner * k * m - 1)
      } yield (inner, inner * k, inner * k * m,
        // size floors at the shard: a shorter dim would clamp the
        // stored chunk below `inner` and the declared shard would
        // (correctly) fail its multiple-of-chunk validation
        math.max(inner * k, inner * k * m * nChunks - tail)))
      fmt <- Gen.oneOf(2, 3)
      sharded <- if (fmt == 3) Gen.oneOf(false, true) else Gen.const(false)
      comp <- Gen.oneOf(None, Some("zlib"), Some("zstd"), Some("blosc"),
        Some("blosc:lz4"))
    } yield (dtype, dims.toVector, fmt, sharded, comp)

    var case_i = 0
    val prop = Prop.forAllNoShrink(caseGen) {
      case (dtype, dims, fmt, sharded, comp) =>
        case_i += 1
        val names = dims.indices.map(i => s"d$i")
        val shape = dims.map(_._4).toArray
        val n = shape.product
        // in-range deterministic-but-varied values per dtype
        val vals = Array.tabulate(n) { i =>
          val v = ((i * 37 + case_i * 101) % 201) - 100
          dtype match {
            case DType.F64 => v / 2.0
            case DType.F32 => v / 2.0 // dyadic: exact in float32
            case DType.U8  => (v + 100).toDouble
            case _         => v.toDouble
          }
        }
        val src = NdArray.fromDoubles(dtype, shape, vals)
        val ds = XbeamDataset.fromLocal(spark,
          Map("v" -> (names, src)),
          chunks = names.zip(dims.map(_._3)).toMap)
        val store = java.nio.file.Files
          .createTempDirectory("zarr_prop").toString + "/s"
        ds.toZarr(store,
          zarrChunks =
            if (sharded || dims.exists(d => d._1 != d._3))
              names.zip(dims.map(_._1)).toMap else Map.empty,
          compressor = comp, zarrFormat = fmt,
          zarrShards =
            if (sharded) names.zip(dims.map(_._2)).toMap else Map.empty)
        val back = XbeamDataset.fromZarr(spark, store)
          .collectConsolidated()._2.vars("v").arr
        val clue = s"dtype=$dtype dims=$dims fmt=$fmt sharded=$sharded " +
          s"comp=$comp"
        (back.dtype == src.dtype && back.sameAs(src)) :| clue
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25)
        .withInitialSeed(org.scalacheck.rng.Seed(graft.FuzzSeed(201609L))), prop)
    assert(res.passed, res.status.toString)
  }
}
