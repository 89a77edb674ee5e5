package graft.sources.zarr

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.{streaming => streaming}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.ChunkGrid
import graft.ndarray.DType
import graft.sources.Zarr

/** DataSourceV2 connector exposing a Zarr store as a Spark SQL table —
  * the Spark-native form of the reference's splittable `ReadDataset`
  * source (core.py:675-761) and its generic `RangeSource`
  * (range_source.py:29-100): one `InputPartition` per chunk stands in
  * for the byte-weighted dynamic splits, and Catalyst drives the
  * pushdowns the reference hand-rolls.
  *
  * Schema is the tabular projection (TabularBridge): one BIGINT column
  * per dimension (global index) + one column per variable. Pushdowns:
  *   - column pruning reaches the store: unprojected variables are
  *     never read from disk (the scan's ReadSchema shows it);
  *   - comparison predicates on dimension columns prune whole chunks
  *     from `planInputPartitions` (the reference's head/tail scan
  *     rewrite, dataset.py:366-397, generalized to any dim range); the
  *     same predicates stay residual post-scan, so semantics are exact
  *     even though pruning is chunk-granular.
  *
  * Usage: `spark.read.format("zarr").load(path)`.
  */
class ZarrDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zarr"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(options.get("paths"))
    require(p != null && p.nonEmpty, "zarr source requires a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val p = pathOf(options)
    // writes target paths that don't hold a store yet: report an empty
    // schema (ACCEPT_ANY_SCHEMA lets the query schema through); reads
    // of a missing store fail at scan build with a real message
    if (!Zarr.storeExists(p)) new StructType()
    else ZarrTable.schemaFor(p, options.getBoolean("coords", false))
  }

  // a catalog CREATE TABLE declares columns up front (the session
  // catalog stores them); the store's own metadata stays authoritative
  // — getTable resolves from the store and the analyzer reconciles,
  // so a mistyped declared schema fails at query time with a real
  // column-level message instead of silently reading wrong columns
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // the session catalog qualifies stored locations as file: URIs
    // (file:/x or file:///x) — normalize back to a filesystem path
    val rawPath = properties.get("path")
    val path =
      if (rawPath != null && rawPath.startsWith("file:"))
        java.nio.file.Paths.get(java.net.URI.create(rawPath)).toString
      else rawPath
    val coords = "true".equalsIgnoreCase(properties.getOrDefault("coords", "false"))
    val declared =
      if (schema == null || schema.isEmpty || !Zarr.storeExists(path)) None
      else {
        // a catalog table carries its declared columns: validate each
        // against the store (name + type; nullability is the catalog's
        // business) and serve exactly the declared shape
        val real = ZarrTable.schemaFor(path, coords)
        schema.fields.foreach { f =>
          val r = real.fields.find(_.name == f.name).getOrElse(
            throw new IllegalArgumentException(
              s"declared column ${f.name} does not exist in zarr store " +
                s"$path (columns: ${real.fieldNames.mkString(", ")})"))
          require(r.dataType == f.dataType,
            s"declared column ${f.name} is ${f.dataType} but the store " +
              s"projects ${r.dataType}")
        }
        Some(schema)
      }
    new ZarrTable(path, coords, declared)
  }
}

object ZarrTable {
  private[zarr] def sparkTypeOf(dt: DType): DataType = dt match {
    case DType.F32 | DType.F64 => DoubleType
    case _ => LongType
  }

  /** With `coords=true`, each dim that has a stored coordinate array
    * additionally projects a `<dim>_coord` column carrying the
    * coordinate VALUE at that index — how xarray users address data. */
  def schemaFor(path: String, coords: Boolean = false): StructType = {
    val store = Zarr.openStore(path)
    val dims = store.template.dimOrder
    val vars = store.template.vars.keys.toSeq.sorted
    val coordCols =
      if (!coords) Seq.empty
      else dims.filter(store.coordVars.contains).map { d =>
        val m = store.coordVars(d)
        // string coordinates (station/label arrays) project as STRING;
        // everything else as the CF-decoded numeric type
        val t = if (m.stringDType.isDefined) StringType
          else sparkTypeOf(Zarr.decodedDType(m))
        StructField(s"${d}_coord", t, nullable = false)
      }
    StructType(
      dims.map(d => StructField(d, LongType, nullable = false)) ++
        coordCols ++
        vars.map(v => StructField(v,
          sparkTypeOf(store.template.vars(v).dtype), nullable = false)))
  }
}

class ZarrTable(path: String, coords: Boolean = false,
                declared: Option[StructType] = None)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"zarr:$path"
  override def schema(): StructType = declared.getOrElse {
    if (!Zarr.storeExists(path)) new StructType()
    else ZarrTable.schemaFor(path, coords)
  }
  override def capabilities(): util.Set[TableCapability] =
    // BATCH_WRITE routes DataFrameWriter.save onto the V2 write plans;
    // V1_BATCH_WRITE marks the Write as the InsertableRelation fallback
    // the physical planner then executes (both are required)
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE,
      // writes carry their own schema (the table may not exist yet);
      // ZarrWrite validates dim/var columns itself
      TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(path, coords,
      options.getLong("maxChunksPerTrigger", 0L))
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new ZarrWriteBuilder(path, info)
}

class ZarrScanBuilder(path: String, coords: Boolean = false,
                      maxChunksPerTrigger: Long = 0L)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  // LIMIT pushdown is chunk-granular: planning stops once the kept
  // chunks cover `limit` cells, so `SELECT ... LIMIT 100` against a
  // million-chunk store plans one task instead of a million. Partial
  // by construction (a chunk overshoots), so Spark keeps its own
  // limit on top and results are exact.
  private var pushedLimit: Int = -1
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = limit
    true
  }
  override def isPartiallyPushed(): Boolean = true

  private val store = Zarr.openStore(path)
  private val dimOrder = store.template.dimOrder
  private var required: StructType = ZarrTable.schemaFor(path, coords)
  private var pushed: Array[Filter] = Array.empty
  // per-dim inclusive global-index bounds from pushed predicates
  private var bounds: Map[String, (Long, Long)] = Map.empty
  // per-variable inclusive value bounds, used against the store's
  // chunk-stats sidecar (ChunkStats) when one exists
  private var varBounds: Map[String, (Double, Double)] = Map.empty
  // per-dim inclusive COORDINATE-value bounds from predicates on
  // `<dim>_coord` columns, kept in the column's own value space:
  // integer/datetime coordinates are nanosecond-scale longs well beyond
  // 2^53, where a double round-trip would mis-prune by up to 1024 ns
  private var coordBoundsL: Map[String, (Long, Long)] = Map.empty
  private var coordBoundsD: Map[String, (Double, Double)] = Map.empty
  // per-dim wanted-value sets from equality/IN predicates on STRING
  // `<dim>_coord` columns (station = 'S03'); several predicates on one
  // dim intersect
  private var coordStrSets: Map[String, Set[String]] = Map.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // with a complete aggregate pushed, the scan's output IS the
    // aggregated row — Spark's post-agg pruning doesn't apply to it
    if (pushedAgg.isEmpty && pushedGroupAgg.isEmpty) required = requiredSchema

  /** Record dim-column ranges for chunk pruning; every filter stays
    * residual (returned), so chunk-granular pruning can never change
    * results. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val dimSet = dimOrder.toSet
    val varSet = store.template.vars.keySet
    def clamp(d: String, lo: Long, hi: Long): Unit = {
      val (clo, chi) = bounds.getOrElse(d, (Long.MinValue, Long.MaxValue))
      bounds += d -> (math.max(clo, lo), math.min(chi, hi))
    }
    // variable-value bounds are kept inclusive and conservatively
    // widened (Long endpoints that don't convert exactly to Double
    // round OUTWARD), so stats pruning can only be a superset cut
    def vclamp(v: String, lo: Double, hi: Double): Unit = {
      val (clo, chi) = varBounds.getOrElse(v,
        (Double.NegativeInfinity, Double.PositiveInfinity))
      varBounds += v -> (math.max(clo, lo), math.min(chi, hi))
    }
    def fl(v: Long) = ChunkStats.floorDouble(v)
    def ce(v: Long) = ChunkStats.ceilDouble(v)
    val inf = Double.PositiveInfinity
    // `<dim>_coord` predicate handling: only for dims that actually
    // have a stored coordinate array (others can't be pruned or even
    // projected). Long clamps saturate at the Long range edges.
    def coordDim(c: String): Option[String] =
      if (!c.endsWith("_coord")) None
      else Some(c.stripSuffix("_coord")).filter(store.coordVars.contains)
    def cclampL(c: String, lo: Long, hi: Long): Unit = coordDim(c).foreach { d =>
      val (clo, chi) = coordBoundsL.getOrElse(d, (Long.MinValue, Long.MaxValue))
      coordBoundsL += d -> (math.max(clo, lo), math.min(chi, hi))
    }
    def cclampD(c: String, lo: Double, hi: Double): Unit = coordDim(c).foreach { d =>
      val (clo, chi) = coordBoundsD.getOrElse(d,
        (Double.NegativeInfinity, Double.PositiveInfinity))
      coordBoundsD += d -> (math.max(clo, lo), math.min(chi, hi))
    }
    def incL(v: Long) = if (v == Long.MaxValue) v else v + 1
    def decL(v: Long) = if (v == Long.MinValue) v else v - 1
    val isCoord: String => Boolean = c => coordDim(c).isDefined
    def cstr(c: String, vs: Set[String]): Unit = coordDim(c).foreach { d =>
      coordStrSets += d ->
        coordStrSets.get(d).map(_.intersect(vs)).getOrElse(vs)
    }
    filters.foreach {
      case EqualTo(c, x: String) if isCoord(c) => cstr(c, Set(x))
      case In(c, vs) if isCoord(c) && vs.nonEmpty &&
          vs.forall(_.isInstanceOf[String]) =>
        cstr(c, vs.iterator.map(_.asInstanceOf[String]).toSet)
      case EqualTo(c, x: Long) if isCoord(c) => cclampL(c, x, x)
      case EqualTo(c, x: Int) if isCoord(c) => cclampL(c, x.toLong, x.toLong)
      case EqualTo(c, x: Double) if isCoord(c) => cclampD(c, x, x)
      case GreaterThan(c, x: Long) if isCoord(c) => cclampL(c, incL(x), Long.MaxValue)
      case GreaterThan(c, x: Int) if isCoord(c) => cclampL(c, x + 1L, Long.MaxValue)
      case GreaterThan(c, x: Double) if isCoord(c) => cclampD(c, Math.nextUp(x), inf)
      case GreaterThanOrEqual(c, x: Long) if isCoord(c) => cclampL(c, x, Long.MaxValue)
      case GreaterThanOrEqual(c, x: Int) if isCoord(c) => cclampL(c, x.toLong, Long.MaxValue)
      case GreaterThanOrEqual(c, x: Double) if isCoord(c) => cclampD(c, x, inf)
      case LessThan(c, x: Long) if isCoord(c) => cclampL(c, Long.MinValue, decL(x))
      case LessThan(c, x: Int) if isCoord(c) => cclampL(c, Long.MinValue, x - 1L)
      case LessThan(c, x: Double) if isCoord(c) => cclampD(c, -inf, Math.nextDown(x))
      case LessThanOrEqual(c, x: Long) if isCoord(c) => cclampL(c, Long.MinValue, x)
      case LessThanOrEqual(c, x: Int) if isCoord(c) => cclampL(c, Long.MinValue, x.toLong)
      case LessThanOrEqual(c, x: Double) if isCoord(c) => cclampD(c, -inf, x)
      case _ => ()
    }
    filters.foreach {
      case EqualTo(d, v: Long) if dimSet(d) => clamp(d, v, v)
      case EqualTo(d, v: Int) if dimSet(d) => clamp(d, v.toLong, v.toLong)
      case GreaterThan(d, v: Long) if dimSet(d) => clamp(d, v + 1, Long.MaxValue)
      case GreaterThan(d, v: Int) if dimSet(d) => clamp(d, v + 1L, Long.MaxValue)
      case GreaterThanOrEqual(d, v: Long) if dimSet(d) => clamp(d, v, Long.MaxValue)
      case GreaterThanOrEqual(d, v: Int) if dimSet(d) => clamp(d, v.toLong, Long.MaxValue)
      case LessThan(d, v: Long) if dimSet(d) => clamp(d, Long.MinValue, v - 1)
      case LessThan(d, v: Int) if dimSet(d) => clamp(d, Long.MinValue, v - 1L)
      case LessThanOrEqual(d, v: Long) if dimSet(d) => clamp(d, Long.MinValue, v)
      case LessThanOrEqual(d, v: Int) if dimSet(d) => clamp(d, Long.MinValue, v.toLong)
      case EqualTo(v, x: Double) if varSet(v) => vclamp(v, x, x)
      case EqualTo(v, x: Long) if varSet(v) => vclamp(v, fl(x), ce(x))
      case EqualTo(v, x: Int) if varSet(v) => vclamp(v, x.toDouble, x.toDouble)
      // strict Double comparisons tighten exactly by one ulp (v > x on
      // doubles is v >= nextUp(x)); strict Long comparisons stay at the
      // conservative inclusive endpoint
      case GreaterThan(v, x: Double) if varSet(v) => vclamp(v, Math.nextUp(x), inf)
      case GreaterThan(v, x: Long) if varSet(v) => vclamp(v, fl(x), inf)
      case GreaterThan(v, x: Int) if varSet(v) => vclamp(v, x.toDouble, inf)
      case GreaterThanOrEqual(v, x: Double) if varSet(v) => vclamp(v, x, inf)
      case GreaterThanOrEqual(v, x: Long) if varSet(v) => vclamp(v, fl(x), inf)
      case GreaterThanOrEqual(v, x: Int) if varSet(v) => vclamp(v, x.toDouble, inf)
      case LessThan(v, x: Double) if varSet(v) => vclamp(v, -inf, Math.nextDown(x))
      case LessThan(v, x: Long) if varSet(v) => vclamp(v, -inf, ce(x))
      case LessThan(v, x: Int) if varSet(v) => vclamp(v, -inf, x.toDouble)
      case LessThanOrEqual(v, x: Double) if varSet(v) => vclamp(v, -inf, x)
      case LessThanOrEqual(v, x: Long) if varSet(v) => vclamp(v, -inf, ce(x))
      case LessThanOrEqual(v, x: Int) if varSet(v) => vclamp(v, -inf, x.toDouble)
      case _ => ()
    }
    pushed = filters.filter {
      case EqualTo(c, _) => dimSet(c) || varSet(c) || isCoord(c)
      case In(c, _) => isCoord(c)
      case GreaterThan(c, _) => dimSet(c) || varSet(c) || isCoord(c)
      case GreaterThanOrEqual(c, _) => dimSet(c) || varSet(c) || isCoord(c)
      case LessThan(c, _) => dimSet(c) || varSet(c) || isCoord(c)
      case LessThanOrEqual(c, _) => dimSet(c) || varSet(c) || isCoord(c)
      case _ => false
    }
    filters // all residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  // ---- aggregate pushdown: COUNT(*) / MIN / MAX with zero chunk IO.
  // COUNT(*) is the dim-size product (every cell is a row, fill
  // included); MIN/MAX over a dim column are 0 / size-1; MIN over a
  // float variable folds the stats sidecar's per-unit mins (NaN sorts
  // last in Spark, so data-min == Spark-min unless ALL values are NaN,
  // which the fold reproduces); MAX additionally requires the sidecar's
  // hasNan=false (one NaN makes the true max NaN). Only complete,
  // filterless, ungrouped aggregations push — anything else runs the
  // normal scan. The reference has no metadata-answered aggregates at
  // all; this is what the consolidated-metadata + stats design buys.
  private var pushedAgg: Option[(StructType, Array[Any])] = None

  private def simpleCol(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      Some(nr.fieldNames.head)
    case _ => None
  }

  private def aggValue(f: AggregateFunc,
                       stats: => Option[Map[String, ChunkStats.VarStatsMeta]])
      : Option[(StructField, Any)] = {
    val dimSizes = store.template.dims.toMap
    val nonEmpty = dimSizes.values.forall(_ > 0)
    def varMinMax(v: String, wantMax: Boolean): Option[Double] =
      stats.flatMap(_.get(v)).flatMap { m =>
        if (wantMax && m.hasNan) None
        else ChunkStats.readVar(path, v, m.entries).map { mm =>
          var best = Double.NaN
          var i = 0
          while (i < mm.length) {
            val x = mm(i + (if (wantMax) 1 else 0))
            if (!x.isNaN && (best.isNaN ||
              (if (wantMax) x > best else x < best))) best = x
            i += 2
          }
          best // NaN = every unit all-NaN = the true (all-NaN) min
        }
      }
    def isFloatVar(v: String) = store.template.vars.get(v).exists(vs =>
      vs.dtype == graft.ndarray.DType.F32 || vs.dtype == graft.ndarray.DType.F64)
    f match {
      case _: CountStar =>
        Some((StructField("count_star", LongType, nullable = false),
          dimSizes.values.product))
      case m: Min => simpleCol(m.column).flatMap { c =>
        if (dimSizes.contains(c) && nonEmpty)
          Some((StructField(s"min_$c", LongType, nullable = false), 0L))
        else if (isFloatVar(c) && nonEmpty)
          varMinMax(c, wantMax = false)
            .map(v => (StructField(s"min_$c", DoubleType, nullable = false), v))
        else None
      }
      case m: Max => simpleCol(m.column).flatMap { c =>
        if (dimSizes.contains(c) && nonEmpty)
          Some((StructField(s"max_$c", LongType, nullable = false),
            dimSizes(c) - 1))
        else if (isFloatVar(c) && nonEmpty)
          varMinMax(c, wantMax = true)
            .map(v => (StructField(s"max_$c", DoubleType, nullable = false), v))
        else None
      }
      case _ => None
    }
  }

  private def resolveAgg(agg: Aggregation): Option[(StructType, Array[Any])] = {
    if (agg.groupByExpressions.nonEmpty) return None
    // residual-filter safety: any recorded predicate means rows are
    // filtered AFTER the scan, so metadata answers would overcount
    if (bounds.nonEmpty || varBounds.nonEmpty ||
      coordBoundsL.nonEmpty || coordBoundsD.nonEmpty || pushed.nonEmpty)
      return None
    lazy val stats = ChunkStats.readIndex(path)
    val resolved = agg.aggregateExpressions.map(f => aggValue(f, stats))
    if (resolved.exists(_.isEmpty)) None
    else Some((StructType(resolved.map(_.get._1)),
      resolved.map(_.get._2: Any)))
  }

  // ---- GROUPED aggregate pushdown: GROUP BY over dim columns with
  // COUNT(*)/MIN/MAX over dim columns is pure grid arithmetic — each
  // group's count is the product of the NON-grouped dim sizes, a
  // grouped dim's min/max is the group value itself, a non-grouped
  // dim's is 0 / size-1. The result can be enormous (one row per
  // group-space cell), so it is emitted DISTRIBUTEDLY: flat group
  // ranges become input partitions and readers de-flatten row-major —
  // still zero chunk IO. Float-variable aggregates don't push here
  // (the stats sidecar is per chunk, not per group value).
  private var pushedGroupAgg
      : Option[(StructType, Array[Long], Seq[ZarrGroupedAggScan.GAgg])] = None

  private def resolveGroupedAgg(agg: Aggregation)
      : Option[(StructType, Array[Long], Seq[ZarrGroupedAggScan.GAgg])] = {
    import ZarrGroupedAggScan.{GAgg, GConst, GGroupVal}
    if (agg.groupByExpressions.isEmpty) return None
    if (bounds.nonEmpty || varBounds.nonEmpty ||
      coordBoundsL.nonEmpty || coordBoundsD.nonEmpty || pushed.nonEmpty)
      return None
    val dimSizes = store.template.dims.toMap
    val gdOpt = agg.groupByExpressions.toSeq.map(simpleCol)
    if (gdOpt.exists(g => g.isEmpty || !dimSizes.contains(g.get))) return None
    val gd = gdOpt.map(_.get)
    if (gd.distinct.length != gd.length) return None
    val aggs: Seq[Option[(StructField, GAgg)]] =
      agg.aggregateExpressions.toSeq.map {
        case _: CountStar =>
          val cnt = dimSizes.keys.filterNot(gd.contains).map(dimSizes).product
          Some((StructField("count_star", LongType, nullable = false),
            GConst(cnt): GAgg))
        case m: Min => simpleCol(m.column).flatMap { c =>
          if (!dimSizes.contains(c)) None
          else if (gd.contains(c)) Some((
            StructField(s"min_$c", LongType, nullable = false),
            GGroupVal(gd.indexOf(c)): GAgg))
          else Some((StructField(s"min_$c", LongType, nullable = false),
            GConst(0L): GAgg))
        }
        case m: Max => simpleCol(m.column).flatMap { c =>
          if (!dimSizes.contains(c)) None
          else if (gd.contains(c)) Some((
            StructField(s"max_$c", LongType, nullable = false),
            GGroupVal(gd.indexOf(c)): GAgg))
          else Some((StructField(s"max_$c", LongType, nullable = false),
            GConst(dimSizes(c) - 1): GAgg))
        }
        case _ => None
      }
    if (aggs.exists(_.isEmpty)) return None
    val schema = StructType(
      gd.map(d => StructField(d, LongType, nullable = false)) ++
        aggs.map(_.get._1))
    // any zero-extent dim = an empty table = ZERO groups (not rows of
    // count 0); the empty sentinel is an empty size array
    val groupSizes =
      if (dimSizes.values.exists(_ == 0)) Array.empty[Long]
      else gd.map(dimSizes).toArray
    Some((schema, groupSizes, aggs.map(_.get._2)))
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    resolveAgg(agg).isDefined || resolveGroupedAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    resolveAgg(agg) match {
      case Some(sv) => pushedAgg = Some(sv); true
      case None => resolveGroupedAgg(agg) match {
        case Some(g) => pushedGroupAgg = Some(g); true
        case None => false // no partial-pushdown mode: run the real scan
      }
    }
  }

  /** Coordinate-predicate chunk pruning, resolved once at plan time: a
    * constrained dim's (1-D, plan-scale) coordinate array is read on
    * the driver — the same CF-decoded values the `<dim>_coord` column
    * emits — and each chunk along that dim keeps iff ANY of its
    * coordinate values satisfies the pushed range. Per-element (not
    * min/max), so it needs no monotonicity; integer/datetime
    * coordinates compare in exact Long space. The predicates stay
    * residual, so this is only ever a superset cut. This is the SQL
    * face of the chunk engine's `sel` (dataset.py:366-397's range
    * rewrite, generalized to any stored coordinate). */
  private def coordKeepSets(): Map[String, Array[Boolean]] = {
    val chunksByDim = store.inferChunks
    (coordBoundsL.keySet ++ coordBoundsD.keySet ++
      coordStrSets.keySet).iterator.flatMap { d =>
      val m = store.coordVars(d)
      val c = chunksByDim.getOrElse(d, return Map.empty)
      if (m.stringDType.isDefined) {
        // string coordinate: keep each chunk iff any of its label
        // values is in the wanted set (equality/IN only — numeric
        // bounds can't arise on a STRING column)
        val vals = Zarr.readStringCoord(path, d, m)
        val want = coordStrSets(d)
        val nChunks = (vals.length + c - 1) / c
        val keep = new Array[Boolean](nChunks)
        var i = 0
        while (i < vals.length) {
          if (want.contains(vals(i))) keep(i / c) = true
          i += 1
        }
        Iterator.single(d -> keep)
      } else {
      val arr = Zarr.decodeCf(m, Zarr.readCoord(path, d, m))
      val n = arr.size
      val isFloat = arr.dtype == graft.ndarray.DType.F32 ||
        arr.dtype == graft.ndarray.DType.F64
      val (loL, hiL) = coordBoundsL.getOrElse(d, (Long.MinValue, Long.MaxValue))
      val (loD, hiD) = coordBoundsD.getOrElse(d,
        (Double.NegativeInfinity, Double.PositiveInfinity))
      // cross-space constraints (a Double predicate on an integer
      // coordinate or vice versa) fold in conservatively
      val satisfies: Long => Boolean =
        if (isFloat) {
          val lo = math.max(loD, ChunkStats.floorDouble(loL))
          val hi = math.min(hiD, ChunkStats.ceilDouble(hiL))
          i => { val x = arr.getDouble(i); x >= lo && x <= hi }
        } else {
          val lo = if (loD <= Long.MinValue.toDouble) loL
            else math.max(loL, math.ceil(loD).toLong)
          val hi = if (hiD >= Long.MaxValue.toDouble) hiL
            else math.min(hiL, math.floor(hiD).toLong)
          i => { val x = arr.getLong(i); x >= lo && x <= hi }
        }
      val nChunks = ((n + c - 1) / c).toInt
      val keep = new Array[Boolean](nChunks)
      var i = 0L
      while (i < n) {
        if (satisfies(i)) keep((i / c).toInt) = true
        i += 1
      }
      Iterator.single(d -> keep)
      }
    }.toMap
  }

  override def build(): Scan = pushedAgg match {
    case Some((schema, values)) => new ZarrAggScan(path, schema, values)
    case None => pushedGroupAgg match {
      case Some((schema, groupSizes, aggs)) =>
        new ZarrGroupedAggScan(path, schema, groupSizes, aggs)
      case None =>
        new ZarrScan(path, store.template.dims, store.inferChunks,
          store.arrays, required, bounds, maxChunksPerTrigger, varBounds,
          coordKeepSets(), pushedLimit)
    }
  }
}

/** A completely-pushed aggregation: one partition, one row, ZERO chunk
  * reads — COUNT(*)/MIN/MAX answered from the store's dim sizes and the
  * [[ChunkStats]] sidecar at plan time. */
class ZarrAggScan(path: String, schema: StructType, values: Array[Any])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"zarr:$path aggPushed=${schema.fieldNames.mkString(",")} (no chunk IO)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(ZarrInputPartition(Array.empty))
  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrAggReaderFactory(values)
}

class ZarrAggReaderFactory(values: Array[Any]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow =
        new GenericInternalRow(values.clone())
      override def close(): Unit = ()
    }
}

object ZarrGroupedAggScan {
  /** One aggregate's per-group value: a grid constant (COUNT, or a
    * non-grouped dim's min/max) or the group's own value along group
    * dim `idx` (a grouped dim's min/max). */
  sealed trait GAgg extends Serializable
  final case class GConst(v: Long) extends GAgg
  final case class GGroupVal(idx: Int) extends GAgg

  /** Flat group-range partition [start, end). */
  final case class GroupRange(start: Long, end: Long) extends InputPartition
}

/** A completely-pushed GROUPED aggregation over dim columns: one row
  * per group-space cell, values from grid arithmetic, ZERO chunk
  * reads. The group space partitions into flat ranges so a
  * billion-group store still answers distributedly. */
class ZarrGroupedAggScan(path: String, schema: StructType,
                         groupSizes: Array[Long],
                         aggs: Seq[ZarrGroupedAggScan.GAgg])
    extends Scan with Batch {
  import ZarrGroupedAggScan._
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"zarr:$path groupedAggPushed=${schema.fieldNames.mkString(",")} (no chunk IO)"
  override def planInputPartitions(): Array[InputPartition] = {
    if (groupSizes.isEmpty) return Array.empty // zero-extent dim: no rows
    val total = groupSizes.product
    val per = 1L << 20
    val n = ((total + per - 1) / per).toInt
    Array.tabulate[InputPartition](n)(i =>
      GroupRange(i * per, math.min((i + 1) * per, total)))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrGroupedAggReaderFactory(groupSizes, aggs.toArray)
}

class ZarrGroupedAggReaderFactory(groupSizes: Array[Long],
                                  aggs: Array[ZarrGroupedAggScan.GAgg])
    extends PartitionReaderFactory {
  import ZarrGroupedAggScan._
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val range = p.asInstanceOf[GroupRange]
      private var flat = range.start - 1
      override def next(): Boolean = { flat += 1; flat < range.end }
      override def get(): InternalRow = {
        val k = groupSizes.length
        val vals = new Array[Any](k + aggs.length)
        // de-flatten row-major over the group dims (groupBy order)
        var rem = flat
        var i = k - 1
        while (i >= 0) {
          vals(i) = rem % groupSizes(i)
          rem /= groupSizes(i)
          i -= 1
        }
        var a = 0
        while (a < aggs.length) {
          vals(k + a) = aggs(a) match {
            case GConst(v) => v
            case GGroupVal(idx) => vals(idx).asInstanceOf[Long]
          }
          a += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
}

/** One chunk of the store = one Spark input partition. */
case class ZarrInputPartition(offsets: Array[Long]) extends InputPartition

class ZarrScan(path: String, dims: Seq[(String, Long)], chunks: Map[String, Int],
               metas: Map[String, Zarr.ArrayMeta], required: StructType,
               bounds: Map[String, (Long, Long)],
               maxChunksPerTrigger: Long = 0L,
               varBounds: Map[String, (Double, Double)] = Map.empty,
               coordKeep: Map[String, Array[Boolean]] = Map.empty,
               limitRows: Int = -1)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Exact relation statistics from store metadata: the chunk grid is
    * plan-time knowledge, so row count is the Σ over PLANNED (i.e.
    * post-pruning) chunks of their clamped cell counts and bytes
    * follow from the projected column widths. Without this a DSv2
    * relation reports `spark.sql.defaultSizeInBytes` (effectively
    * infinite) and a small store can never auto-broadcast in a join —
    * with it, Catalyst sizes joins against a zarr table exactly as it
    * would a parquet table with fresh stats. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    // Catalyst may ask for stats several times per plan; never pay the
    // O(#chunks) enumeration per ask. When every active pruner is
    // per-dim (dim bounds + coordinate keep-masks), the row count
    // decomposes into a product of per-dim sums — O(#chunks-per-dim),
    // no key enumeration at all (the million-chunk posture). Only the
    // cross-dim pruners (stats sidecar, runtime IN-filters) need the
    // real chunk walk, and that walk is memoized with
    // planInputPartitions' cache, which execution reuses anyway.
    val rows = arithmeticRowCount.getOrElse {
      planInputPartitions().iterator.map {
        case ZarrInputPartition(offsets) =>
          val dimOrder = dims.map(_._1)
          offsets.indices.map { i =>
            val d = dimOrder(i)
            math.min(chunks(d).toLong, dims(i)._2 - offsets(i))
          }.product
        case _ => 0L
      }.sum
    }
    // projected width: dim columns are 8-byte longs; var columns their
    // decoded itemsize (coordinate columns ride at 8 bytes too)
    val dimNames = dims.map(_._1).toSet
    val width = required.fields.map { f =>
      if (dimNames.contains(f.name)) 8L
      else metas.get(f.name)
        .map(m => Zarr.decodedDType(m).itemsize.toLong).getOrElse(8L)
    }.sum
    val bytes = rows * math.max(width, 1L)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }

  // ---- runtime (DPP-style) chunk pruning: when this scan joins a
  // small dimension table on a dim column, Spark materializes the
  // build side's key set at execution and hands it here as an IN
  // predicate BEFORE planInputPartitions — a chunk survives only if
  // some key falls inside its dim range. This is dynamic partition
  // pruning for the chunk grid: the star-join shape (huge store x
  // broadcast dim filter) reads only the chunks the dim table names,
  // with zero user annotations. Unparseable predicates are ignored
  // (pruning is only ever an optimization; pushed filters stay
  // residual).
  @volatile private var runtimeIn: Map[String, Array[Long]] = Map.empty

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    dims.map(_._1).filter(required.fieldNames.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray

  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val dimNames = dims.map(_._1).toSet
    val parsed = predicates.flatMap { p =>
      if (p.name() != "IN" || p.children().isEmpty) None
      else p.children()(0) match {
        case r: NamedReference if dimNames.contains(r.fieldNames.mkString(".")) =>
          val vals = p.children().drop(1).flatMap {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              l.value() match {
                case n: java.lang.Number => Some(n.longValue())
                case _ => None
              }
            case _ => None
          }
          // a partially-unparseable value list must NOT prune (missing
          // keys would silently drop matching chunks)
          if (vals.length == p.children().length - 1)
            Some(r.fieldNames.mkString(".") -> vals.sorted)
          else None
        case _ => None
      }
    }
    runtimeIn = parsed.groupBy(_._1).map { case (d, vs) =>
      // several IN filters on one dim intersect; keep the smallest set
      d -> vs.map(_._2).minBy(_.length)
    }
  }
  override def description(): String =
    s"zarr:$path chunks=$chunks prunedDims=${bounds.keys.mkString(",")}" +
      (if (varBounds.isEmpty) ""
       else s" statsPrunedVars=${varBounds.keys.toSeq.sorted.mkString(",")}") +
      (if (coordKeep.isEmpty) ""
       else s" coordPrunedDims=${coordKeep.keys.toSeq.sorted.mkString(",")}")

  /** Exact row count WITHOUT enumerating chunk keys, valid whenever no
    * cross-dim pruner is active: per-dim keeps are independent, so the
    * count is the product over dims of the kept clamped chunk lengths. */
  private def arithmeticRowCount: Option[Long] = {
    // a pushed LIMIT truncates planPartitions to the covering chunks —
    // fall back to the (memoized) enumeration so stats stay limit-sized
    if (varBounds.nonEmpty || runtimeIn.nonEmpty || limitRows >= 0) return None
    Some(dims.map { case (d, size) =>
      val ch = chunks(d).toLong
      val n = ((size + ch - 1) / ch).toInt
      var sum = 0L
      var c = 0
      while (c < n) {
        val off = c * ch
        val len = math.min(ch, size - off)
        val keptBounds = bounds.get(d).forall { case (lo, hi) =>
          off <= hi && off + len - 1 >= lo
        }
        val keptCoord = coordKeep.get(d).forall(_(c))
        if (keptBounds && keptCoord) sum += len
        c += 1
      }
      sum
    }.product)
  }

  /** planInputPartitions is asked for once by execution and possibly
    * several more times by stats/planning; memoize per runtime-filter
    * state so the chunk walk happens once. */
  @volatile private var plannedCache
      : (Map[String, Array[Long]], Array[InputPartition]) = null

  override def planInputPartitions(): Array[InputPartition] = {
    val rIn = runtimeIn
    val cached = plannedCache
    if (cached != null && (cached._1 eq rIn)) return cached._2
    val planned = planPartitions(rIn)
    plannedCache = (rIn, planned)
    planned
  }

  private def planPartitions(rIn: Map[String, Array[Long]])
      : Array[InputPartition] = {
    val dimOrder = dims.map(_._1)
    val dimSizes = dims.toMap
    // data-variable zone-map pruning: resolved once at plan time from
    // the store's stats sidecar (absent/stale/grid-mismatched sidecars
    // resolve to no-op); every pushed predicate stays residual, so this
    // only ever drops chunks whose [min,max] cannot satisfy the filter
    val statPrune: Map[String, Long] => Boolean =
      ChunkStats.pruner(path, varBounds, chunks, dimSizes)
        .getOrElse((_: Map[String, Long]) => true)
    val all = ChunkGrid.iterChunkKeys(dimOrder, chunks, dimSizes)
      .filter { key =>
        bounds.forall { case (d, (lo, hi)) =>
          val off = key.offsets(d)
          val len = math.min(chunks(d).toLong, dimSizes(d) - off)
          off <= hi && off + len - 1 >= lo
        } && coordKeep.forall { case (d, keep) =>
          keep((key.offsets(d) / chunks(d)).toInt)
        } && rIn.forall { case (d, vals) =>
          val off = key.offsets(d)
          val end = off + math.min(chunks(d).toLong, dimSizes(d) - off)
          // sorted values: binary-search the first >= off
          var lo = 0
          var hi = vals.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (vals(mid) < off) lo = mid + 1 else hi = mid
          }
          lo < vals.length && vals(lo) < end
        } && statPrune(key.offsets)
      }
      .map(key => ZarrInputPartition(dimOrder.map(key.offsets).toArray): InputPartition)
      .toArray
    // chunk-granular LIMIT: stop planning once the kept chunks cover
    // the pushed row cap (Spark applies the exact limit on top)
    if (limitRows < 0) all
    else {
      var cells = 0L
      var keep = 0
      while (keep < all.length && cells < limitRows) {
        val offs = all(keep).asInstanceOf[ZarrInputPartition].offsets
        cells += dimOrder.indices.map { i =>
          math.min(chunks(dimOrder(i)).toLong, dimSizes(dimOrder(i)) - offs(i))
        }.product
        keep += 1
      }
      all.take(keep)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrReaderFactory(path, dims, chunks, metas, required)

  override def toMicroBatchStream(checkpointLocation: String)
      : streaming.MicroBatchStream =
    new ZarrMicroBatchStream(planInputPartitions(), createReaderFactory(),
      maxChunksPerTrigger)
}

/** Offset = number of store chunks consumed (the deterministic
  * `iterChunkKeys` order is the log), PLUS the total planned chunk
  * count at checkpoint time: if the store grows or rechunks between
  * runs (extendDim along a non-leading dim interleaves new chunks into
  * the C-order log), a bare count would silently remap to different
  * chunks — the total acts as a store-shape fingerprint and restart
  * fails loudly instead. */
class ZarrChunkOffset(val n: Long, val total: Long) extends streaming.Offset {
  override def json: String = s"""{"n":$n,"total":$total}"""
  override def equals(o: Any): Boolean = o match {
    case z: ZarrChunkOffset => z.n == n && z.total == total
    case _ => false
  }
  override def hashCode: Int = (n, total).hashCode
}

/** Stream a (bounded) Zarr store chunk-by-chunk — the backfill/replay
  * pattern: an archive store feeds the same watermarked streaming
  * pipelines live sources do, rate-limited by `maxChunksPerTrigger`
  * chunks per micro-batch (admission control; 0 = all available). The
  * chunk list in deterministic `iterChunkKeys` order is the log and
  * the offset is a plain consumed-chunk count, so restarts resume
  * exactly and every chunk is read once. Partition pruning and column
  * pruning from the batch scan apply unchanged. */
class ZarrMicroBatchStream(partitions: Array[InputPartition],
                           factory: PartitionReaderFactory,
                           maxPerTrigger: Long)
    extends streaming.MicroBatchStream
    with streaming.SupportsAdmissionControl
    with streaming.SupportsTriggerAvailableNow {

  private val total = partitions.length.toLong

  override def initialOffset(): streaming.Offset = new ZarrChunkOffset(0L, total)
  override def deserializeOffset(json: String): streaming.Offset = {
    val t = json.trim
    // legacy checkpoints were a bare count with no shape fingerprint
    val (n, ckptTotal) =
      if (t.startsWith("{")) {
        def field(k: String): Long =
          s""""$k"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(t)
            .map(_.group(1).toLong)
            .getOrElse(throw new IllegalArgumentException(
              s"malformed zarr stream offset: $t"))
        (field("n"), field("total"))
      } else (t.toLong, total)
    require(ckptTotal == total,
      s"zarr stream checkpoint was taken against a store planning " +
        s"$ckptTotal chunks, but the store now plans $total: the C-order " +
        "chunk log has been remapped (store grown along a non-leading dim, " +
        "rechunked, or pruned differently) and resuming would silently " +
        "skip or re-read chunks — restart with a fresh checkpoint")
    new ZarrChunkOffset(n, total)
  }
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: streaming.ReadLimit =
    if (maxPerTrigger > 0) streaming.ReadLimit.maxRows(maxPerTrigger)
    else streaming.ReadLimit.allAvailable()

  override def latestOffset(): streaming.Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is used")

  override def latestOffset(start: streaming.Offset,
                            limit: streaming.ReadLimit): streaming.Offset = {
    val s = start.asInstanceOf[ZarrChunkOffset].n
    val cap = limit match {
      case mr: streaming.ReadMaxRows => s + mr.maxRows()
      case _ => total
    }
    new ZarrChunkOffset(math.min(total, cap), total)
  }

  override def reportLatestOffset(): streaming.Offset =
    new ZarrChunkOffset(total, total)

  // the store is bounded: everything is already "available now"
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(start: streaming.Offset,
                                   end: streaming.Offset): Array[InputPartition] =
    partitions.slice(start.asInstanceOf[ZarrChunkOffset].n.toInt,
      end.asInstanceOf[ZarrChunkOffset].n.toInt)

  override def createReaderFactory(): PartitionReaderFactory = factory
}

/** `metas` resolves on the driver at planning time and ships with the
  * factory, so partition readers never re-fetch array metadata (at
  * scale that's 1-2 metadata GETs per chunk saved). */
class ZarrReaderFactory(path: String, dims: Seq[(String, Long)],
                        chunks: Map[String, Int],
                        metas: Map[String, Zarr.ArrayMeta],
                        required: StructType)
    extends PartitionReaderFactory {
  // driver-vended store config/credentials for forked executor JVMs
  // (captured at factory construction on the driver)
  private val ambient = graft.sources.GraftProps.snapshot()
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    graft.sources.GraftProps.restore(ambient)
    new ZarrPartitionReader(new ZarrChunkContext(path, dims, chunks, metas,
      required, partition.asInstanceOf[ZarrInputPartition].offsets))
  }

  // Columnar (vectorized) reads: the projected schema is always
  // long/double columns, so every chunk decodes straight into on-heap
  // column vectors and flows into whole-stage codegen through Spark's
  // ColumnarToRow — no per-cell row allocation, no boxing.
  override def supportColumnarReads(partition: InputPartition): Boolean = true
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    graft.sources.GraftProps.restore(ambient)
    new ZarrColumnarPartitionReader(new ZarrChunkContext(path, dims, chunks,
      metas, required, partition.asInstanceOf[ZarrInputPartition].offsets))
  }
}

/** Shared per-partition decode state for the row and columnar readers:
  * the chunk's clamped extents plus, per projected column, whether it
  * is a dim index, a dim coordinate, or a variable region (read once,
  * in the VARIABLE's own axis order — `varDimPos(c) == null` marks the
  * fast path where that order matches the template's). */
private[zarr] final class ZarrChunkContext(path: String,
                                           dims: Seq[(String, Long)],
                                           chunks: Map[String, Int],
                                           metas: Map[String, Zarr.ArrayMeta],
                                           required: StructType,
                                           val offsets: Array[Long]) {
  private val dimOrder = dims.map(_._1)
  private val dimSizes = dims.toMap
  val lens: Array[Int] = dimOrder.zipWithIndex.map { case (d, i) =>
    math.min(chunks(d).toLong, dimSizes(d) - offsets(i)).toInt
  }.toArray
  val total: Long = lens.map(_.toLong).product

  val fields: Array[StructField] = required.fields
  val dimPos: Array[Int] = fields.map(f => dimOrder.indexOf(f.name))
  val coordOf: Array[Int] = fields.map { f =>
    if (f.name.endsWith("_coord")) dimOrder.indexOf(f.name.stripSuffix("_coord"))
    else -1
  }
  val isStr: Array[Boolean] = fields.map(_.dataType == StringType)
  val coordArrays: Array[graft.ndarray.NdArray] = fields.zipWithIndex.map {
    case (f, i) =>
      if (coordOf(i) < 0 || isStr(i)) null
      else {
        val dim = f.name.stripSuffix("_coord")
        val m = metas.getOrElse(dim,
          throw new IllegalArgumentException(s"no stored coordinate for ${f.name}"))
        Zarr.decodeCf(m, Zarr.readCoord(path, dim, m))
      }
  }
  // string coordinates, pre-encoded to UTF-8 once per partition: the
  // row reader wraps them as UTF8String without copying, the columnar
  // reader appends the raw bytes
  val coordStrs: Array[Array[Array[Byte]]] = fields.zipWithIndex.map {
    case (f, i) =>
      if (coordOf(i) < 0 || !isStr(i)) null
      else {
        val dim = f.name.stripSuffix("_coord")
        val m = metas.getOrElse(dim,
          throw new IllegalArgumentException(s"no stored coordinate for ${f.name}"))
        Zarr.readStringCoord(path, dim, m)
          .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
  }
  val varArrays: Array[graft.ndarray.NdArray] =
    new Array[graft.ndarray.NdArray](fields.length)
  val varDimPos: Array[Array[Int]] = new Array[Array[Int]](fields.length)
  val varLens: Array[Array[Int]] = new Array[Array[Int]](fields.length)
  fields.zipWithIndex.foreach { case (f, i) =>
    if (!dimOrder.contains(f.name) && coordOf(i) < 0) {
      val meta = metas(f.name)
      val pos = meta.dims.map { d =>
        val p = dimOrder.indexOf(d)
        require(p >= 0, s"variable ${f.name} has dim $d not in the store's " +
          s"dimension set ${dimOrder.mkString(",")}")
        p
      }.toArray
      val vOffsets = pos.map(offsets)
      val vLens = pos.map(lens)
      varArrays(i) =
        Zarr.decodeCf(meta, Zarr.readRegion(path, f.name, meta, vOffsets, vLens))
      if (!(pos.length == lens.length && pos.zipWithIndex.forall(p => p._1 == p._2))) {
        varDimPos(i) = pos
        varLens(i) = vLens
      }
    }
  }
  val isFloat: Array[Boolean] = fields.map(_.dataType == DoubleType)

  /** Variable flat index for column c at odometer position (flat, idx). */
  @inline def varFlat(c: Int, flat: Long, idx: Array[Int]): Long =
    if (varDimPos(c) == null) flat
    else {
      val pos = varDimPos(c)
      val vl = varLens(c)
      var vf = 0L
      var j = 0
      while (j < pos.length) { vf = vf * vl(j) + idx(pos(j)); j += 1 }
      vf
    }

  /** Advance the row-major odometer one step. */
  @inline def advance(idx: Array[Int]): Unit = {
    var k = lens.length - 1
    var carry = true
    while (k >= 0 && carry) {
      idx(k) += 1
      if (idx(k) == lens(k)) { idx(k) = 0; k -= 1 } else carry = false
    }
  }
}

class ZarrPartitionReader(cc: ZarrChunkContext)
    extends PartitionReader[InternalRow] {
  private val idx = new Array[Int](cc.lens.length)
  private var flat = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (flat >= cc.total) return false
    val fields = cc.fields
    val vals = new Array[Any](fields.length)
    var c = 0
    while (c < fields.length) {
      vals(c) =
        if (cc.dimPos(c) >= 0) cc.offsets(cc.dimPos(c)) + idx(cc.dimPos(c))
        else if (cc.coordOf(c) >= 0) {
          val gi = cc.offsets(cc.coordOf(c)) + idx(cc.coordOf(c))
          if (cc.isStr(c))
            org.apache.spark.unsafe.types.UTF8String
              .fromBytes(cc.coordStrs(c)(gi.toInt))
          else if (cc.isFloat(c)) cc.coordArrays(c).getDouble(gi)
          else cc.coordArrays(c).getLong(gi)
        }
        else {
          val vflat = cc.varFlat(c, flat, idx)
          if (cc.isFloat(c)) cc.varArrays(c).getDouble(vflat)
          else cc.varArrays(c).getLong(vflat)
        }
      c += 1
    }
    current = new GenericInternalRow(vals)
    cc.advance(idx)
    flat += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

class ZarrColumnarPartitionReader(cc: ZarrChunkContext)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val batchCap = 1 << 14 // 16Ki cells per batch
  private val idx = new Array[Int](cc.lens.length)
  private var flat = 0L
  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    if (flat >= cc.total) return false
    val n = math.min(batchCap.toLong, cc.total - flat).toInt
    val fields = cc.fields
    val vecs = fields.map(f => new OnHeapColumnVector(n, f.dataType))
    var r = 0
    while (r < n) {
      var c = 0
      while (c < fields.length) {
        if (cc.dimPos(c) >= 0)
          vecs(c).putLong(r, cc.offsets(cc.dimPos(c)) + idx(cc.dimPos(c)))
        else if (cc.coordOf(c) >= 0) {
          val gi = cc.offsets(cc.coordOf(c)) + idx(cc.coordOf(c))
          if (cc.isStr(c)) vecs(c).putByteArray(r, cc.coordStrs(c)(gi.toInt))
          else if (cc.isFloat(c)) vecs(c).putDouble(r, cc.coordArrays(c).getDouble(gi))
          else vecs(c).putLong(r, cc.coordArrays(c).getLong(gi))
        } else {
          val vflat = cc.varFlat(c, flat, idx)
          if (cc.isFloat(c)) vecs(c).putDouble(r, cc.varArrays(c).getDouble(vflat))
          else vecs(c).putLong(r, cc.varArrays(c).getLong(vflat))
        }
        c += 1
      }
      cc.advance(idx)
      flat += 1
      r += 1
    }
    batch = new ColumnarBatch(
      vecs.toArray[org.apache.spark.sql.vectorized.ColumnVector], n)
    true
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = if (batch != null) { batch.close(); batch = null }
}
