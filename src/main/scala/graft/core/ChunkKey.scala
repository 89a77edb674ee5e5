package graft.core

/** Locates a chunk inside the virtual whole dataset — the Spark-native
  * equivalent of xarray_beam.Key (reference core.py:60-237).
  *
  * - `offsets`: dim name → integer element offset from the origin
  *   (core.py:144).
  * - `vars`: the subset of data variables in this chunk; None = all
  *   (core.py:146). Kept as a sorted Seq for a stable Spark encoder.
  * - `indices`: dim name → integer chunk index — the reference's newer
  *   addressing mode (core.py:71-80). Mutually exclusive with
  *   `offsets` (core.py:136-137): a key addresses chunks one way or
  *   the other, never both. With 100-element chunks along x,
  *   offsets={x: 400} ≡ indices={x: 4}.
  *
  * Keys must act as deterministic shuffle keys; the reference encodes
  * sorted state (core.py:228-237). Here [[canonical]] is that encoding —
  * a sorted, unambiguous string used as the groupByKey key.
  */
final case class ChunkKey(offsets: Map[String, Long],
                          vars: Option[Seq[String]],
                          indices: Map[String, Long] = Map.empty) {

  require(offsets.isEmpty || indices.isEmpty,
    "offsets and indices are mutually exclusive")

  def varsSet: Option[Set[String]] = vars.map(_.toSet)

  /** Functional update, mirroring Key.with_offsets (core.py:163-181):
    * value < 0 removes the dim. Rejected on an indices-keyed key
    * (core.py:173-174). */
  def withOffsets(updates: (String, Long)*): ChunkKey = {
    if (indices.nonEmpty) throw new IllegalArgumentException(
      "cannot call withOffsets on a ChunkKey with indices")
    val m = updates.foldLeft(offsets) { case (acc, (d, o)) =>
      if (o < 0) acc - d else acc + (d -> o)
    }
    copy(offsets = m)
  }

  /** Key.with_indices (core.py:183-201): value < 0 removes the dim.
    * Rejected on an offsets-keyed key (core.py:193-194). */
  def withIndices(updates: (String, Long)*): ChunkKey = {
    if (offsets.nonEmpty) throw new IllegalArgumentException(
      "cannot call withIndices on a ChunkKey with offsets")
    val m = updates.foldLeft(indices) { case (acc, (d, i)) =>
      if (i < 0) acc - d else acc + (d -> i)
    }
    copy(indices = m)
  }

  def withVars(vs: Option[Set[String]]): ChunkKey =
    copy(vars = vs.map(_.toSeq.sorted))

  /** Convert an offsets-keyed key to the equivalent indices-keyed key
    * against a chunk grid. Offsets must sit on chunk boundaries — a
    * mid-chunk offset has no chunk index. */
  def toIndices(chunks: Map[String, Int]): ChunkKey = {
    if (indices.nonEmpty) return this
    val idx = offsets.map { case (d, o) =>
      val c = chunks.getOrElse(d, throw new IllegalArgumentException(
        s"no chunk size for dim $d"))
      require(o % c == 0,
        s"offset $o on dim $d is not aligned to chunk size $c")
      d -> o / c
    }
    ChunkKey(Map.empty[String, Long], vars, idx)
  }

  /** Inverse of [[toIndices]]: chunk indices → element offsets. */
  def toOffsets(chunks: Map[String, Int]): ChunkKey = {
    if (offsets.nonEmpty || indices.isEmpty) return this
    val offs = indices.map { case (d, i) =>
      val c = chunks.getOrElse(d, throw new IllegalArgumentException(
        s"no chunk size for dim $d"))
      d -> i * c
    }
    ChunkKey(offs, vars)
  }

  /** Deterministic binary-stable encoding for shuffles (sorted entries,
    * like Key.__getstate__ core.py:228-237). Offsets- and indices-keyed
    * keys encode distinctly, as in the reference's state tuple. */
  def canonical: String = {
    val vs = vars.map(_.sorted.mkString(",")).getOrElse("*")
    if (indices.nonEmpty) {
      val idx = indices.toSeq.sortBy(_._1).map { case (d, i) => s"$d=$i" }.mkString(",")
      s"indices[$idx]|vars[$vs]"
    } else {
      val offs = offsets.toSeq.sortBy(_._1).map { case (d, o) => s"$d=$o" }.mkString(",")
      s"offsets[$offs]|vars[$vs]"
    }
  }

  override def toString: String = canonical
}

object ChunkKey {
  val empty: ChunkKey = ChunkKey(Map.empty[String, Long], None)

  def apply(offsets: (String, Long)*): ChunkKey =
    ChunkKey(offsets.toMap, None)

  def withVars(offsets: Map[String, Long], vars: Set[String]): ChunkKey =
    ChunkKey(offsets, Some(vars.toSeq.sorted))

  def atIndices(indices: (String, Long)*): ChunkKey =
    ChunkKey(Map.empty[String, Long], None, indices.toMap)
}
