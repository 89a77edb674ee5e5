package graft.core

/** Locates a chunk inside the virtual whole dataset — the Spark-native
  * equivalent of xarray_beam.Key (reference core.py:60-237).
  *
  * - `offsets`: dim name → integer element offset from the origin
  *   (core.py:144).
  * - `vars`: the subset of data variables in this chunk; None = all
  *   (core.py:146). Kept as a sorted Seq for a stable Spark encoder.
  *
  * Keys must act as deterministic shuffle keys; the reference encodes
  * sorted state (core.py:228-237). Here [[canonical]] is that encoding —
  * a sorted, unambiguous string used as the groupByKey key.
  */
final case class ChunkKey(offsets: Map[String, Long],
                          vars: Option[Seq[String]]) {

  def varsSet: Option[Set[String]] = vars.map(_.toSet)

  /** Functional update, mirroring Key.with_offsets (core.py:163-181):
    * value < 0 removes the dim. */
  def withOffsets(updates: (String, Long)*): ChunkKey = {
    val m = updates.foldLeft(offsets) { case (acc, (d, o)) =>
      if (o < 0) acc - d else acc + (d -> o)
    }
    copy(offsets = m)
  }

  def withVars(vs: Option[Set[String]]): ChunkKey =
    copy(vars = vs.map(_.toSeq.sorted))

  /** Deterministic binary-stable encoding for shuffles (sorted entries,
    * like Key.__getstate__ core.py:230-237). */
  def canonical: String = {
    val offs = offsets.toSeq.sortBy(_._1).map { case (d, o) => s"$d=$o" }.mkString(",")
    val vs = vars.map(_.sorted.mkString(",")).getOrElse("*")
    s"offsets[$offs]|vars[$vs]"
  }

  override def toString: String = canonical
}

object ChunkKey {
  val empty: ChunkKey = ChunkKey(Map.empty[String, Long], None)

  def apply(offsets: (String, Long)*): ChunkKey =
    ChunkKey(offsets.toMap, None)

  def withVars(offsets: Map[String, Long], vars: Set[String]): ChunkKey =
    ChunkKey(offsets, Some(vars.toSeq.sorted))
}
