package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.{ArrayChunk, ChunkGrid, ChunkKey, Template, VarArray, VarSpec}
import graft.ndarray.{DType, NdArray}
import graft.operators.ChunkTransforms

/** Bridge between the chunked tensor world and Spark SQL rows (SURVEY
  * §7.8 — our extension; the reference has no relational surface). One
  * row per grid position: one BIGINT column per dimension (global
  * index) plus one column per variable (typed by dtype). Both
  * directions are distributed flatMap/groupBy — chunk payloads never
  * visit the driver.
  *
  * This is what makes the chunk engine DuckDB-oracle-checkable: any
  * chunk pipeline ending in `toDataFrame` can be compared against plain
  * SQL over the same source rows.
  */
object TabularBridge {

  private def sparkTypeOf(dt: DType): DataType = dt match {
    case DType.F32 | DType.F64 => DoubleType
    case _ => LongType
  }

  /** Explode a chunked dataset into rows. Requires every variable to
    * span the template's full dim set (use select/splitVars upstream
    * for irregular datasets). */
  def toDataFrame(xds: XbeamDataset): DataFrame = {
    val template = xds.template
    val dims = template.dimOrder
    val varNames = template.vars.keys.toSeq.sorted
    varNames.foreach { v =>
      require(template.vars(v).dims == dims,
        s"toDataFrame requires var $v dims ${template.vars(v).dims} == $dims; " +
          "select() or transpose() first")
    }
    val schema = StructType(
      dims.map(d => StructField(d, LongType, nullable = false)) ++
        varNames.map(v => StructField(v, sparkTypeOf(template.vars(v).dtype),
          nullable = false)))
    val isFloat = varNames.map(v => template.vars(v).dtype match {
      case DType.F32 | DType.F64 => true
      case _ => false
    })
    implicit val rowEnc = Encoders.row(schema)
    xds.chunkDataset.flatMap { p: (ChunkKey, ArrayChunk) =>
      val (key, chunk) = p
      val first = chunk.vars(varNames.head)
      val shape = first.arr.shape
      val n = first.arr.size
      val offsets = dims.map(d => key.offsets.getOrElse(d, 0L)).toArray
      val arrs = varNames.map(chunk.vars(_).arr).toArray
      val idx = new Array[Int](shape.length)
      // lazy row iterator — a chunk's rows stream straight into the
      // downstream operator instead of materializing per-chunk vectors
      new Iterator[Row] {
        private var flat = 0L
        override def hasNext: Boolean = flat < n
        override def next(): Row = {
          val vals = new Array[Any](dims.length + varNames.length)
          var d = 0
          while (d < dims.length) { vals(d) = offsets(d) + idx(d); d += 1 }
          var v = 0
          while (v < arrs.length) {
            vals(dims.length + v) =
              if (isFloat(v)) arrs(v).getDouble(flat) else arrs(v).getLong(flat)
            v += 1
          }
          var k = shape.length - 1
          var carry = true
          while (k >= 0 && carry) {
            idx(k) += 1
            if (idx(k) == shape(k)) { idx(k) = 0; k -= 1 } else carry = false
          }
          flat += 1
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }.toDF()
  }

  /** Build a chunked dataset from rows: each row gives its global dim
    * indices + variable values; rows are grouped by their chunk key
    * (one shuffle on the deterministic key) and assembled into dense
    * blocks. Absent positions get `fill`. */
  def fromDataFrame(df: DataFrame, spark: SparkSession,
                    dims: Seq[(String, Long)],
                    vars: Seq[(String, DType)],
                    chunks: Map[String, Int],
                    fill: Double = Double.NaN): XbeamDataset = {
    import ChunkTransforms.pairEnc
    val dimNames = dims.map(_._1)
    val dimSizes = dims.toMap
    val normalized = ChunkGrid.normalizeChunks(chunks, dimSizes)
    val varNames = vars.map(_._1)
    val cols = (dimNames ++ varNames).map(org.apache.spark.sql.functions.col)
    implicit val midEnc = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong, ExpressionEncoderHack.longArray)
    val dimsB = dims
    val varsB = vars
    val normB = normalized
    val dimSizesB = dimSizes
    // shuffle key = flat chunk index: an 8-byte key instead of a
    // per-row canonical string (string keys allocate and hash the dim
    // names once per ROW — untenable at 10^11 rows)
    //
    // Values travel as Array[Long]: integer dtypes carry the raw long
    // (a via-double path would silently round |v| > 2^53 — e.g.
    // hash-derived ids), float dtypes carry their IEEE bits.
    val keyed: Dataset[(Long, Long, Array[Long])] = df.select(cols: _*)
      .map { row =>
        val offsets = dimsB.indices.map { i =>
          val idx = row.getLong(i)
          val c = normB(dimsB(i)._1)
          (idx / c) * c
        }
        // local flat index inside the chunk (row-major over dim order)
        var flat = 0L
        var chunkIdx = 0L
        dimsB.indices.foreach { i =>
          val (d, size) = dimsB(i)
          val c = normB(d)
          val len = math.min(c.toLong, size - offsets(i))
          flat = flat * len + (row.getLong(i) - offsets(i))
          chunkIdx = chunkIdx * ((size + c - 1) / c) + offsets(i) / c
        }
        val values = varsB.indices.map { v =>
          val isFloat = varsB(v)._2 match {
            case DType.F32 | DType.F64 => true
            case _ => false
          }
          def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)
          row.get(dimsB.length + v) match {
            case l: java.lang.Long =>
              if (isFloat) bits(l.longValue().toDouble) else l.longValue()
            case i: java.lang.Integer =>
              if (isFloat) bits(i.intValue().toDouble) else i.longValue()
            case d: java.lang.Double =>
              if (isFloat) bits(d.doubleValue()) else d.doubleValue().toLong
            case f: java.lang.Float =>
              if (isFloat) bits(f.doubleValue()) else f.longValue()
            case null => if (isFloat) bits(Double.NaN) else Double.NaN.toLong
            case other =>
              val d = other.toString.toDouble
              if (isFloat) bits(d) else d.toLong
          }
        }.toArray
        (chunkIdx, flat, values)
      }
    val pairs = keyed.groupByKey(_._1)(Encoders.scalaLong)
      .mapGroups { (chunkIdx, it) =>
        val key = ChunkGrid.keyForIndex(chunkIdx, dimsB.map(_._1), normB, dimSizesB)
        val shape = dimsB.map { case (d, size) =>
          val c = normB(d)
          math.min(c.toLong, size - key.offsets(d)).toInt
        }.toArray
        val arrays = varsB.map { case (_, dt) =>
          NdArray.fill(dt, shape, fill)
        }
        it.foreach { case (_, flat, values) =>
          varsB.indices.foreach { v =>
            varsB(v)._2 match {
              case DType.F32 | DType.F64 => arrays(v).setDouble(flat,
                java.lang.Double.longBitsToDouble(values(v)))
              case _ => arrays(v).setLong(flat, values(v))
            }
          }
        }
        (key, ArrayChunk(varsB.indices.map { v =>
          varsB(v)._1 -> VarArray(dimsB.map(_._1), arrays(v))
        }.toMap))
      }
    val template = Template(dims,
      vars.map { case (n, dt) => n -> VarSpec(dimNames, dt) }.toMap,
      Map.empty, Map.empty)
    XbeamDataset.fromPairs(spark, template, normalized, pairs)
  }

}

/** Encoders for primitive-array tuple members (no built-in factory). */
private object ExpressionEncoderHack {
  import org.apache.spark.sql.Encoder
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
