package graft.operators

import graft.core.{ArrayChunk, ChunkGrid, ChunkKey, VarArray}
import graft.ndarray.NdArray

/** Pure chunk-level operators: split and consolidate — the kernels under
  * the reference's SplitChunks / ConsolidateChunks / SplitVariables /
  * ConsolidateVariables PTransforms (rechunk.py:85-500).
  */
object ChunkOps {

  /** Split one (key, chunk) into sub-chunks on the target grid
    * (split_chunks, rechunk.py:401-429). Target dims absent from the
    * chunk are ignored. */
  def splitChunks(key: ChunkKey, chunk: ArrayChunk,
                  targetChunks: Map[String, Int]): Seq[(ChunkKey, ArrayChunk)] = {
    val sizes = chunk.dimSizes
    val dims = targetChunks.keys.filter(sizes.contains).toSeq.sorted
    if (dims.isEmpty) return Seq(key -> chunk)
    val allBounds: Seq[Seq[(Long, Long)]] = dims.map { d =>
      val start = key.offsets.getOrElse(d, 0L)
      val stop = start + sizes(d)
      ChunkGrid.splitBounds(start, stop, targetChunks(d))
    }
    def product(ls: Seq[Seq[(Long, Long)]]): Seq[Seq[(Long, Long)]] =
      ls.foldLeft(Seq(Seq.empty[(Long, Long)])) { (acc, next) =>
        acc.flatMap(prefix => next.map(prefix :+ _))
      }
    product(allBounds).map { bounds =>
      val ranges = dims.zip(bounds).map { case (d, (start, stop)) =>
        val base = key.offsets.getOrElse(d, 0L)
        d -> ((start - base).toInt, (stop - start).toInt)
      }.toMap
      val newOffsets = key.offsets ++ dims.zip(bounds).map { case (d, (start, _)) =>
        d -> start
      }
      (key.copy(offsets = newOffsets), chunk.isel(ranges))
    }
  }

  /** One output chunk per data variable, dropping offsets for dims the
    * variable lacks (split_variables, rechunk.py:458-471). */
  def splitVariables(key: ChunkKey, chunk: ArrayChunk): Seq[(ChunkKey, ArrayChunk)] =
    chunk.vars.toSeq.sortBy(_._1).map { case (name, va) =>
      val offsets = key.offsets.filter { case (d, _) => va.dims.contains(d) }
      (ChunkKey(offsets, Some(Seq(name))), ArrayChunk(Map(name -> va)))
    }

  /** Round a key down to the target chunk grid (_round_chunk_key,
    * rechunk.py:292-306). */
  def roundChunkKey(key: ChunkKey, targetChunks: Map[String, Int]): ChunkKey =
    key.copy(offsets = key.offsets.map { case (d, off) =>
      targetChunks.get(d) match {
        case None => d -> off
        case Some(-1) => d -> 0L
        case Some(c) => d -> c.toLong * (off / c)
      }
    })

  /** Consolidate chunks sharing a var-group into one block-assembled
    * chunk (consolidate_chunks, rechunk.py:85-197). Validates key
    * uniqueness and grid completeness with the reference's error
    * conditions. Returns one (key, chunk) per var group. */
  def consolidateChunks(inputs: Seq[(ChunkKey, ArrayChunk)]): Seq[(ChunkKey, ArrayChunk)] = {
    val seen = scala.collection.mutable.Set[ChunkKey]()
    inputs.foreach { case (k, _) =>
      require(!seen.contains(k), s"chunk keys are not unique: $k")
      seen += k
    }
    inputs.groupBy(_._1.varsSet).toSeq.sortBy(_._1.map(_.toSeq.sorted.mkString(",")))
      .map { case (varGroup, group) => consolidateVarGroup(varGroup, group) }
  }

  private def consolidateVarGroup(varGroup: Option[Set[String]],
                                  inputs: Seq[(ChunkKey, ArrayChunk)]): (ChunkKey, ArrayChunk) = {
    // sorted unique offsets per dim across the group
    val offsetsByDim: Map[String, Vector[Long]] = inputs
      .flatMap(_._1.offsets.toSeq).groupBy(_._1)
      .map { case (d, vs) => d -> vs.map(_._2).distinct.sorted.toVector }
    val offsetIndex: Map[String, Map[Long, Int]] =
      offsetsByDim.map { case (d, vs) => d -> vs.zipWithIndex.toMap }
    val combinedKey = ChunkKey(
      offsetsByDim.map { case (d, vs) => d -> vs.head },
      varGroup.map(_.toSeq.sorted))

    val expected = offsetsByDim.values.map(_.length.toLong).product
    require(expected == inputs.length,
      s"some expected chunks are missing for vars=$varGroup: " +
        s"expected $expected, got ${inputs.length}")

    val varNames = inputs.head._2.varNames
    val newVars = varNames.toSeq.sorted.map { name =>
      val first = inputs.head._2.vars(name)
      val dims = first.dims
      val dtype = first.arr.dtype
      // per-dim: size of the block at each offset index (validated consistent)
      val sizesPerDim: Map[String, Array[Int]] = dims.map { d =>
        d -> Array.fill(offsetsByDim.getOrElse(d, Vector(0L)).length)(-1)
      }.toMap
      inputs.foreach { case (k, c) =>
        val va = c.vars(name)
        dims.zipWithIndex.foreach { case (d, ax) =>
          val idx = offsetIndex.get(d).map(_(k.offsets.getOrElse(d, 0L))).getOrElse(0)
          val s = va.arr.shape(ax)
          val arr = sizesPerDim(d)
          require(arr(idx) == -1 || arr(idx) == s,
            s"inconsistent block sizes for var $name dim $d at index $idx")
          arr(idx) = s
        }
      }
      val outShape = dims.map(d => sizesPerDim(d).sum).toArray
      val cumStarts: Map[String, Array[Int]] = dims.map { d =>
        d -> sizesPerDim(d).scanLeft(0)(_ + _).dropRight(1)
      }.toMap
      // grid contiguity: block i's offset must sit exactly at the
      // cumulative size of blocks before it — a gap means a chunk of the
      // grid is absent (reference error, rechunk.py:121-125, 189-191)
      dims.foreach { d =>
        offsetsByDim.get(d).foreach { offs =>
          val origin = offs.head
          offs.zipWithIndex.foreach { case (off, i) =>
            require(off - origin == cumStarts(d)(i),
              s"some expected chunks are missing for vars=$varGroup: dim $d " +
                s"offset $off does not follow contiguously from $origin")
          }
        }
      }
      val blocks = inputs.map { case (k, c) =>
        val va = c.vars(name)
        val starts = dims.map { d =>
          val idx = offsetIndex.get(d).map(_(k.offsets.getOrElse(d, 0L))).getOrElse(0)
          cumStarts(d)(idx)
        }.toArray
        (starts, va.arr)
      }
      name -> VarArray(dims, NdArray.blockAssemble(dtype, outShape, blocks))
    }.toMap
    (combinedKey, ArrayChunk(newVars))
  }

  /** Merge chunks with identical offsets but different variables
    * (consolidate_variables, rechunk.py:201-238). Returns a vars=None
    * key, matching ConsolidateVariables (rechunk.py:355-366). */
  def consolidateVariables(inputs: Seq[(ChunkKey, ArrayChunk)]): (ChunkKey, ArrayChunk) = {
    val offsets = inputs.map(_._1.offsets).distinct
    require(offsets.length == 1,
      s"consolidating variables requires identical offsets, got $offsets")
    val allVars = inputs.flatMap(_._2.vars.keys)
    val dupes = allVars.groupBy(identity).filter(_._2.length > 1).keys
    require(dupes.isEmpty, s"cannot merge chunks with overlapping variables: $dupes")
    val merged = inputs.map(_._2).reduce(_.merge(_))
    (ChunkKey(offsets.head, None), merged)
  }

  /** In-memory rechunk: consolidate then split (rechunk.py:493-500). */
  def inMemoryRechunk(inputs: Seq[(ChunkKey, ArrayChunk)],
                      targetChunks: Map[String, Int]): Seq[(ChunkKey, ArrayChunk)] =
    consolidateChunks(inputs).flatMap { case (k, c) =>
      splitChunks(k, c, targetChunks)
    }
}
