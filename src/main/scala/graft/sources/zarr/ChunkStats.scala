package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.sources.BlobStore

/** Per-chunk min/max statistics for a Zarr store — zone maps for array
  * data, the missing analogue of Parquet's column statistics: written
  * once at store-write time, they let the DSv2 scan prune whole chunks
  * on DATA-variable predicates (not just dimension ranges), so a
  * selective `WHERE v > k` over a 100 TB store touches only the chunks
  * whose value range can intersect. The reference has no equivalent
  * (its scans enumerate every chunk, core.py:544-670); this is the
  * optimization a Spark-native engine gets to add because Catalyst
  * hands the connector the pushed predicates.
  *
  * Layout (sidecar keys inside the store, invisible to zarr readers):
  *   - `_graft_stats/index.json` — `{"version":1,"vars":{name:
  *     {"dims":[...],"chunks":[...],"grid":[...]}}}`; `chunks`/`grid`
  *     record the stored chunk grid the stats were computed against,
  *     so a rechunked/extended store auto-invalidates on mismatch.
  *     `{"stale":true}` marks stats explicitly invalidated by a later
  *     append (BlobStore has no delete, so staleness is a tombstone).
  *   - `_graft_stats/<var>.minmax` — little-endian float64
  *     (min,max) pairs in C-order of the var's chunk grid.
  *
  * Correctness contract: pruning is only ever a SUPERSET reduction —
  * every pushed predicate stays residual post-scan (ZarrScanBuilder
  * returns all filters), so stale-but-validating stats can only cost
  * performance, never rows; and the three mutation paths invalidate
  * (append tombstones, extendDim tombstones, rechunk changes the grid
  * recorded in the index). Integer mins round DOWN and maxes UP when
  * a Long doesn't convert exactly to Double ([[floorDouble]] /
  * [[ceilDouble]]), so i64 bounds are conservative at any magnitude.
  * All-NaN (never-written float) chunks carry (NaN,NaN): IEEE
  * comparisons with NaN are false, so they prune — exactly matching
  * the NaN fill value a reader would see.
  */
object ChunkStats {
  private val mapper = new ObjectMapper()

  val dirName = "_graft_stats"

  private def base(path: String) = path.stripSuffix("/") + "/" + dirName
  def indexUrl(path: String): String = base(path) + "/index.json"
  def blobUrl(path: String, v: String): String = base(path) + s"/$v.minmax"

  /** Largest double <= l (exact when l converts exactly). */
  def floorDouble(l: Long): Double = {
    val d = l.toDouble
    if (BigDecimal(d) > BigDecimal(l)) Math.nextDown(d) else d
  }

  /** Smallest double >= l (exact when l converts exactly). */
  def ceilDouble(l: Long): Double = {
    val d = l.toDouble
    if (BigDecimal(d) < BigDecimal(l)) Math.nextUp(d) else d
  }

  /** `hasNan` = the variable's data contains at least one NaN anywhere
    * (counting fill-value reads of never-written units) — conservative
    * default true on read. It gates MAX aggregate pushdown: Spark
    * orders NaN above every double, so a single NaN makes the true max
    * NaN while the bounds ignore it. MIN is NaN-immune (NaN sorts
    * last) and COUNT(*) comes from the dim sizes alone. */
  final case class VarStatsMeta(dims: Seq[String], chunks: Seq[Int],
                                grid: Seq[Int], hasNan: Boolean = true) {
    def entries: Long = grid.foldLeft(1L)(_ * _)
  }

  def writeIndex(path: String, metas: Map[String, VarStatsMeta]): Unit = {
    val store = BlobStore.forUrl(path)
    val vars = metas.toSeq.sortBy(_._1).map { case (n, m) =>
      s""""$n":{"dims":[${m.dims.map(d => s""""$d"""").mkString(",")}],""" +
        s""""chunks":[${m.chunks.mkString(",")}],""" +
        s""""grid":[${m.grid.mkString(",")}],""" +
        s""""nan":${m.hasNan}}"""
    }.mkString(",")
    store.write(indexUrl(path),
      s"""{"version":1,"vars":{$vars}}""".getBytes("UTF-8"))
  }

  /** Tombstone the sidecar: appends/extends would make recorded bounds
    * lie, and BlobStore is delete-free, so mutators overwrite the index
    * with an explicit stale marker BEFORE touching data (a racing
    * planner then sees either valid-old-data stats or no stats). */
  def invalidate(path: String): Unit = {
    val store = BlobStore.forUrl(path)
    if (store.exists(indexUrl(path)))
      store.write(indexUrl(path),
        """{"version":1,"stale":true}""".getBytes("UTF-8"))
  }

  def readIndex(path: String): Option[Map[String, VarStatsMeta]] = {
    val store = BlobStore.forUrl(path)
    store.readIfExists(indexUrl(path)).flatMap { bytes =>
      try {
        val root = mapper.readTree(bytes)
        if (root.path("version").asInt(-1) != 1 ||
          root.path("stale").asBoolean(false)) None
        else {
          import scala.jdk.CollectionConverters._
          val vars = root.path("vars")
          Some(vars.fieldNames().asScala.map { n =>
            val v = vars.get(n)
            def ints(f: String) = v.get(f).elements().asScala.map(_.asInt).toSeq
            n -> VarStatsMeta(
              v.get("dims").elements().asScala.map(_.asText).toSeq,
              ints("chunks"), ints("grid"),
              hasNan = v.path("nan").asBoolean(true))
          }.toMap)
        }
      } catch { case _: Exception => None } // unreadable sidecar = no stats
    }
  }

  /** Assemble per-var (min,max) arrays from the collected
    * [[ZarrStatsWrite.rowsFor]] rows and write the full sidecar
    * (blobs + index). Unwritten write units keep the fill-value
    * bounds (NaN for floats — always prunes, matching reads; exact 0
    * for ints); a float var whose cover misses any unit carries
    * hasNan=true (those cells read as the NaN fill). Shared by the
    * write-time pass (toZarr stats=true) and [[graft.api.XbeamDataset.rebuildStats]]. */
  def assembleAndWrite(path: String, metas: Map[String, VarStatsMeta],
                       isFloat: Map[String, Boolean],
                       rows: Iterable[(String, Long, Double, Double, Boolean)])
      : Unit = {
    val arrays = metas.map { case (n, m) =>
      val init = if (isFloat(n)) Double.NaN else 0.0
      n -> Array.fill((m.entries * 2).toInt)(init)
    }
    val nanFlags = scala.collection.mutable.Map[String, Boolean]()
    rows.foreach { case (n, idx, mn, mx, hasNan) =>
      val a = arrays(n)
      a((idx * 2).toInt) = mn
      a((idx * 2).toInt + 1) = mx
      if (hasNan) nanFlags(n) = true
    }
    arrays.foreach { case (n, a) => writeVar(path, n, a) }
    val metasWithNan = metas.map { case (n, m) =>
      val covered = !isFloat(n) || {
        val a = arrays(n)
        var i = 0
        var anyNaN = false
        while (i < a.length && !anyNaN) { anyNaN = a(i).isNaN; i += 1 }
        !anyNaN
      }
      n -> m.copy(hasNan =
        (isFloat(n) && (nanFlags.getOrElse(n, false) || !covered)))
    }
    writeIndex(path, metasWithNan)
  }

  def writeVar(path: String, v: String, minmax: Array[Double]): Unit = {
    val buf = ByteBuffer.allocate(minmax.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    minmax.foreach(buf.putDouble)
    BlobStore.forUrl(path).write(blobUrl(path, v), buf.array())
  }

  def readVar(path: String, v: String, entries: Long): Option[Array[Double]] = {
    BlobStore.forUrl(path).readIfExists(blobUrl(path, v)).flatMap { bytes =>
      if (bytes.length.toLong != entries * 16) None
      else {
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val out = new Array[Double]((entries * 2).toInt)
        var i = 0
        while (i < out.length) { out(i) = buf.getDouble(i * 8); i += 1 }
        Some(out)
      }
    }
  }

  /** Build a chunk-key pruning predicate from the store's stats sidecar,
    * or None when the sidecar is absent, tombstoned, or was computed
    * against a different chunk grid than the scan's (extend/rechunk
    * drift — validated per var, per dim). `varBounds` maps variable
    * name -> inclusive [lo, hi] from the pushed predicates; vars with
    * no usable stats simply don't prune. Runs once at plan time on the
    * driver: one GET for the index + one per constrained var.
    */
  def pruner(path: String, varBounds: Map[String, (Double, Double)],
             storeChunks: Map[String, Int], dimSizes: Map[String, Long])
      : Option[Map[String, Long] => Boolean] = {
    if (varBounds.isEmpty) return None
    readIndex(path).flatMap { metas =>
      val usable = varBounds.flatMap { case (v, (lo, hi)) =>
        metas.get(v).flatMap { m =>
          val gridOk = m.dims.zip(m.chunks).zip(m.grid).forall {
            case ((d, c), g) =>
              storeChunks.get(d).contains(c) && dimSizes.get(d).exists(sz =>
                g.toLong == (sz + c - 1) / c)
          }
          if (!gridOk) None
          else readVar(path, v, m.entries).map(mm => (v, m, mm, lo, hi))
        }
      }.toSeq
      if (usable.isEmpty) None
      else Some { offsets: Map[String, Long] =>
        usable.forall { case (_, m, mm, lo, hi) =>
          var idx = 0L
          var d = 0
          while (d < m.dims.length) {
            idx = idx * m.grid(d) + offsets.getOrElse(m.dims(d), 0L) / m.chunks(d)
            d += 1
          }
          val mn = mm((idx * 2).toInt)
          val mx = mm((idx * 2).toInt + 1)
          // NaN bounds (all-NaN / never-written float chunk) fail both
          // comparisons -> pruned, matching the NaN-filled read
          mx >= lo && mn <= hi
        }
      }
    }
  }
}
