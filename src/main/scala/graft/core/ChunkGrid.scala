package graft.core

/** Chunk-grid math: normalization, key enumeration, offset→slice
  * translation, and split bounds — ports of the pure-math pieces of the
  * reference (dataset.py:84-199 normalize_chunks, core.py:290-363
  * offsets_to_slices / iter key math, rechunk.py:374-397 split bounds).
  */
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
