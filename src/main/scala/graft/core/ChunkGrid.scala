package graft.core

/** Chunk-grid math: normalization, key enumeration, offset→slice
  * translation, and split bounds — ports of the pure-math pieces of the
  * reference (dataset.py:84-199 normalize_chunks, core.py:290-363
  * offsets_to_slices / iter key math, rechunk.py:374-397 split bounds).
  */
/** One dimension's chunk specification (normalize_chunks input forms,
  * dataset.py:98-108): an exact element count, the full dimension
  * (`-1`), or a byte target ("100MB", "64KiB") resolved against dtype
  * itemsize. `'auto'` is deliberately unsupported, exactly like the
  * reference (dataset.py:138-149). */
sealed trait ChunkSpec
object ChunkSpec {
  final case class Elems(n: Long) extends ChunkSpec
  case object Full extends ChunkSpec
  final case class ByteTarget(bytes: Long, raw: String) extends ChunkSpec

  def apply(n: Int): ChunkSpec = if (n == -1) Full else Elems(n)

  private val Pattern = """^\s*([0-9]+(?:\.[0-9]+)?)\s*([kKmMgGtT]?)(i?)[bB]\s*$""".r

  /** Parse "100MB" / "64KiB" / "80B" (decimal unless the `i` binary
    * marker is present, matching dask's byte-string parsing). */
  def parse(s: String): ByteTarget = s match {
    case Pattern(num, unit, bin) =>
      val base = if (bin == "i") 1024L else 1000L
      val exp = if (unit.isEmpty) 0 else "kmgt".indexOf(unit.toLowerCase) + 1
      ByteTarget((num.toDouble * math.pow(base.toDouble, exp.toDouble)).toLong, s)
    case _ => throw new IllegalArgumentException(s"cannot parse byte size: $s")
  }
}

object ChunkGrid {

  /** Normalize a chunks spec against dim sizes: -1 or missing → full
    * dim; sizes clamped to the dim; must divide the key space regularly
    * (only the last chunk per dim may be smaller). */
  def normalizeChunks(chunks: Map[String, Int],
                      dimSizes: Map[String, Long]): Map[String, Int] = {
    chunks.keys.foreach { d =>
      require(dimSizes.contains(d), s"chunks key $d is not a dimension; dims=${dimSizes.keys}")
    }
    dimSizes.map { case (d, size) =>
      val c = chunks.getOrElse(d, -1)
      require(c == -1 || c > 0, s"chunk size for $d must be positive or -1, got $c")
      val n = if (c == -1) size else math.min(c.toLong, size)
      require(n <= Int.MaxValue, s"chunk too large on $d: $n")
      d -> n.toInt
    }
  }

  /** Full normalize_chunks port (dataset.py:84-199): resolves a per-dim
    * [[ChunkSpec]] map — exact counts, `-1`/Full, and byte targets —
    * to concrete integer chunk sizes.
    *
    * Semantics (matching the reference's dask-backed behavior on its
    * own test envelope, dataset_test.py:54-215):
    *   - dims absent from `specs` take `default` (the `...` entry /
    *     single-value spec), else `previousChunks`, else the full dim;
    *   - at most one DISTINCT byte target may appear across all dims
    *     (dataset.py:148-152);
    *   - the byte budget applies to the WHOLE chunk: elements budget =
    *     bytes / itemsize / product(non-byte dims' chunks);
    *   - byte dims share the element budget by a common geometric
    *     factor over their previous chunks (1 when none): each gets
    *     `floor(factor) * prev`, clamped to the dim size; clamped dims
    *     release their share and the rest re-split (this reproduces
    *     dask's previous-chunk-multiple snapping on the tested cases,
    *     e.g. 80B/{x:5,y:1} → {x:5,y:2}; aspect-ratio 8000B/{x:10,y:25}
    *     → {x:20,y:50}).
    *
    * `itemsize` is the combined row byte width: max var itemsize when
    * splitVars else the sum (Template.combinedItemsize, mirroring
    * dataset.py:170-177). */
  def normalizeChunkSpecs(specs: Map[String, ChunkSpec],
                          dimSizes: Map[String, Long],
                          dimOrder: Seq[String],
                          itemsize: Long,
                          default: Option[ChunkSpec] = None,
                          previousChunks: Map[String, Int] = Map.empty): Map[String, Int] = {
    specs.keys.foreach { d =>
      require(dimSizes.contains(d), s"chunks key $d is not a dimension; dims=${dimSizes.keys}")
    }
    val eff: Map[String, ChunkSpec] = dimOrder.map { d =>
      d -> specs.getOrElse(d, default.getOrElse(
        previousChunks.get(d).map(c => ChunkSpec.Elems(c.toLong))
          .getOrElse(ChunkSpec.Full)))
    }.toMap
    val byteTargets = eff.values.collect { case b: ChunkSpec.ByteTarget => b }.toSeq
    require(byteTargets.map(_.bytes).distinct.size <= 1,
      s"cannot provide multiple distinct chunk sizes in bytes: " +
        byteTargets.map(_.raw).mkString("{", ", ", "}"))

    val fixed: Map[String, Int] = eff.collect {
      case (d, ChunkSpec.Full) => d -> dimSizes(d).min(Int.MaxValue).toInt
      case (d, ChunkSpec.Elems(n)) =>
        require(n > 0, s"chunk size for $d must be positive, got $n")
        d -> math.min(n, dimSizes(d)).min(Int.MaxValue).toInt
    }
    val byteDims = dimOrder.filter(d => eff(d).isInstanceOf[ChunkSpec.ByteTarget])
    if (byteDims.isEmpty) return dimOrder.map(d => d -> fixed(d)).toMap

    val bytes = byteTargets.head.bytes
    val fixedProduct = fixed.values.map(_.toLong).product max 1L
    var budget = math.max(1L, bytes / math.max(1L, itemsize) / fixedProduct)

    // iterative clamp-and-resplit over the byte dims
    var adjustable = byteDims.toSet
    val resolved = scala.collection.mutable.Map[String, Int]()
    var changed = true
    while (changed && adjustable.nonEmpty) {
      changed = false
      val prevs = adjustable.map(d => d -> previousChunks.getOrElse(d, 1).toLong).toMap
      val prevProduct = prevs.values.product max 1L
      val factor = math.pow(budget.toDouble / prevProduct.toDouble,
        1.0 / adjustable.size)
      // clamp any dim whose scaled chunk reaches the dim edge
      adjustable.toSeq.sorted.foreach { d =>
        if (!changed && prevs(d) * factor >= dimSizes(d)) {
          val c = dimSizes(d).min(Int.MaxValue).toInt
          resolved(d) = c
          budget = math.max(1L, budget / c)
          adjustable -= d
          changed = true
        }
      }
      if (!changed) {
        adjustable.foreach { d =>
          val snapped = math.max(1L, factor.toLong) * prevs(d)
          resolved(d) = math.min(snapped, dimSizes(d)).min(Int.MaxValue).toInt
        }
        adjustable = Set.empty
      }
    }
    dimOrder.map(d => d -> fixed.getOrElse(d, resolved(d))).toMap
  }

  /** Number of chunks along each dim (ceil). */
  def chunkCounts(chunks: Map[String, Int],
                  dimSizes: Map[String, Long]): Map[String, Long] =
    dimSizes.map { case (d, size) =>
      d -> ((size + chunks(d) - 1) / chunks(d))
    }

  def totalChunks(chunks: Map[String, Int], dimSizes: Map[String, Long]): Long =
    chunkCounts(chunks, dimSizes).values.product

  /** Flat chunk index → ChunkKey offsets, row-major over `dimOrder`
    * (the unravel_index of the reference's ReadDataset, core.py:734-743).
    * This is what lets `spark.range(totalChunks)` distribute the key
    * space with no driver-side enumeration. */
  def keyForIndex(index: Long, dimOrder: Seq[String], chunks: Map[String, Int],
                  dimSizes: Map[String, Long]): ChunkKey = {
    val counts = chunkCounts(chunks, dimSizes)
    var rem = index
    val offsets = Map.newBuilder[String, Long]
    var i = dimOrder.length - 1
    val idxPerDim = new Array[Long](dimOrder.length)
    while (i >= 0) {
      val d = dimOrder(i)
      val c = counts(d)
      idxPerDim(i) = rem % c
      rem /= c
      i -= 1
    }
    require(rem == 0, s"chunk index $index out of range")
    dimOrder.indices.foreach { j =>
      offsets += dimOrder(j) -> idxPerDim(j) * chunks(dimOrder(j))
    }
    ChunkKey(offsets.result(), None)
  }

  /** Inverse of keyForIndex: a key's flat chunk index, row-major over
    * dimOrder. A numeric shuffle key where the canonical string would
    * be allocation-heavy (e.g. per-row in the tabular bridge). */
  def indexForKey(key: ChunkKey, dimOrder: Seq[String], chunks: Map[String, Int],
                  dimSizes: Map[String, Long]): Long = {
    val counts = chunkCounts(chunks, dimSizes)
    var index = 0L
    dimOrder.foreach { d =>
      index = index * counts(d) + key.offsets.getOrElse(d, 0L) / chunks(d)
    }
    index
  }

  /** All chunk keys, row-major over dimOrder (driver-side; for tests and
    * small grids — production scans go through keyForIndex). */
  def iterChunkKeys(dimOrder: Seq[String], chunks: Map[String, Int],
                    dimSizes: Map[String, Long]): Iterator[ChunkKey] = {
    val total = totalChunks(chunks, dimSizes)
    (0L until total).iterator.map(keyForIndex(_, dimOrder, chunks, dimSizes))
  }

  /** Key offsets → per-dim (start, length), clamped to the dim edge
    * (offsets_to_slices, core.py:290-329). */
  def offsetsToRanges(key: ChunkKey, chunks: Map[String, Int],
                      dimSizes: Map[String, Long]): Map[String, (Int, Int)] =
    key.offsets.collect { case (d, off) if dimSizes.contains(d) =>
      val size = dimSizes(d)
      val len = math.min(chunks(d).toLong, size - off)
      require(off >= 0 && len > 0, s"offset $off out of bounds for dim $d (size $size)")
      d -> (off.toInt, len.toInt)
    }

  /** Split [start, stop) at multiples of `multiple`:
    * (5, 10, 3) → [(5,6), (6,9), (9,10)] (rechunk.py:374-397). */
  def splitBounds(start: Long, stop: Long, multiple: Long): Seq[(Long, Long)] = {
    if (multiple == -1) return Seq((start, stop))
    require(multiple > 0, s"invalid multiple: $multiple")
    val out = Seq.newBuilder[(Long, Long)]
    var lo = start
    while (lo < stop) {
      val hi = math.min((lo / multiple + 1) * multiple, stop)
      out += ((lo, hi))
      lo = hi
    }
    out.result()
  }

  /** Validate a (key, chunk) pair against the template + chunk grid —
    * the error catalog of _normalize_and_validate_chunk
    * (dataset.py:236-332). Returns the chunk unchanged on success. */
  def validateChunk(template: Template, chunks: Map[String, Int],
                    splitVars: Boolean)(key: ChunkKey, chunk: ArrayChunk): ArrayChunk = {
    val dimSizes = template.dimSizes
    // variable presence
    val expectVars: Set[String] = key.varsSet.getOrElse(template.vars.keySet)
    if (splitVars)
      require(key.vars.isDefined, "split_vars dataset requires keys with explicit vars")
    val got = chunk.varNames
    require(got == expectVars,
      s"chunk variables $got do not match key variables $expectVars")
    chunk.vars.foreach { case (name, va) =>
      val spec = template.vars.getOrElse(name,
        throw new IllegalArgumentException(s"variable $name not in template"))
      require(va.dims == spec.dims,
        s"dims for variable $name: ${va.dims} != template ${spec.dims}")
      require(va.arr.dtype == spec.dtype,
        s"dtype for variable $name: ${va.arr.dtype.zarr} != template ${spec.dtype.zarr}")
      va.dims.zip(va.arr.shape).foreach { case (d, s) =>
        val size = dimSizes.getOrElse(d,
          throw new IllegalArgumentException(s"dim $d of $name not in template"))
        val chunkSize = chunks.getOrElse(d, size.toInt)
        val off = key.offsets.getOrElse(d, 0L)
        require(off % chunkSize == 0,
          s"offset $off for dim $d is not a multiple of chunk size $chunkSize")
        val expectLen = math.min(chunkSize.toLong, size - off)
        require(s.toLong == expectLen,
          s"unexpected chunk size $s for dim $d at offset $off (expected $expectLen)")
      }
    }
    chunk
  }
}
