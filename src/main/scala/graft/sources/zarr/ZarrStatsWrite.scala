package graft.sources.zarr

import graft.core.VarArray
import graft.ndarray.DType

/** Executor-side half of the [[ChunkStats]] sidecar: given one
  * in-memory chunk variable, emit a (var, write-unit C-order index,
  * min, max) row per store write unit the chunk covers. The in-memory
  * chunk is always a whole multiple of the write unit (toZarr's no-race
  * rule), so units never straddle tasks and every emitted row is the
  * unit's complete bounds. NaNs are skipped (a NaN satisfies no
  * comparison, so excluding it tightens bounds without losing rows);
  * an all-NaN unit emits (NaN, NaN), which always prunes — matching
  * what a reader of that unit would see. Integer bounds widen by one
  * ulp so i64 values beyond 2^53 stay conservative as doubles.
  */
object ZarrStatsWrite {

  /** The 5th field flags whether the unit contains ANY NaN — the bit
    * that decides whether a pushed-down MAX can be answered from the
    * sidecar (Spark orders NaN above every double, so a single NaN
    * makes the true max NaN while the bounds ignore it). */
  def rowsFor(name: String, va: VarArray, offsets: Map[String, Long],
              unit: Seq[Int], grid: Seq[Int])
      : Iterator[(String, Long, Double, Double, Boolean)] = {
    val arr = va.arr
    val nd = va.dims.length
    if (nd == 0 || arr.size == 0) return Iterator.empty
    val shape = arr.shape
    val isInt = arr.dtype match {
      case DType.F32 | DType.F64 => false
      case _ => true
    }
    val subCounts = Array.tabulate(nd)(i => (shape(i) + unit(i) - 1) / unit(i))
    val base = Array.tabulate(nd)(i => offsets.getOrElse(va.dims(i), 0L))
    val sub = new Array[Int](nd)
    val out = Seq.newBuilder[(String, Long, Double, Double, Boolean)]
    var more = true
    while (more) {
      val starts = Array.tabulate(nd)(i => sub(i) * unit(i))
      val lens = Array.tabulate(nd)(i => math.min(unit(i), shape(i) - starts(i)))
      val s = arr.slice(starts, lens)
      var mn = Double.PositiveInfinity
      var mx = Double.NegativeInfinity
      var any = false
      var hasNan = false
      var i = 0L
      val n = s.size
      while (i < n) {
        val x = s.getDouble(i)
        if (x.isNaN) hasNan = true
        else {
          any = true
          if (x < mn) mn = x
          if (x > mx) mx = x
        }
        i += 1
      }
      if (!any) { mn = Double.NaN; mx = Double.NaN }
      else if (isInt) { mn = Math.nextDown(mn); mx = Math.nextUp(mx) }
      var idx = 0L
      var d = 0
      while (d < nd) {
        idx = idx * grid(d) + (base(d) + starts(d)) / unit(d)
        d += 1
      }
      out += ((name, idx, mn, mx, hasNan))
      // odometer over the sub-unit grid
      var k = nd - 1
      more = false
      while (k >= 0 && !more) {
        sub(k) += 1
        if (sub(k) < subCounts(k)) more = true else { sub(k) = 0; k -= 1 }
      }
    }
    out.result().iterator
  }
}
