package graft.operators

import graft.core.ChunkKey

/** Cost-modeled fanout scheduling for multi-stage keyed means — a
  * faithful port of the reference's combiner planner
  * (xarray_beam combiners.py:190-291). The model: per-task runtime =
  * fixed per-chunk overhead (1/1500 s) + bytes at 25 MB/s, plus 0.1 s
  * per extra stage; worker count ≈ max(bytes / 5 GB, 10k). All stage
  * schedules (fanout^stages >= chunkCount) are brute-force costed and
  * the cheapest wins.
  *
  * On Spark, single-shuffle partial aggregation (reduceGroups) already
  * covers moderate reduction ratios; this planner drives the explicit
  * multi-round reduce ([[ChunkTransforms.meanMultiStage]]) for extreme
  * ratios (millions of chunks → one), where one hash-agg round would
  * funnel every partial into a single reducer task.
  */
object FanoutPlanner {

  /** (fanout,)*k + (fanout-1,)*(stages-k) covering chunksCount, with
    * larger fanout at earlier stages (combiners.py:219-232). */
  def completeFanoutBins(fanout: Int, stages: Int, chunksCount: Long): Vector[Int] = {
    (0 to stages).foreach { k =>
      val capacity = math.pow(fanout.toDouble, k.toDouble) *
        math.pow((fanout - 1).toDouble, (stages - k).toDouble)
      if (capacity >= chunksCount)
        return Vector.fill(k)(fanout) ++ Vector.fill(stages - k)(fanout - 1)
    }
    throw new AssertionError(
      s"invalid fanout/stages/chunksCount: $fanout, $stages, $chunksCount")
  }

  /** Estimated runtime (seconds) of every candidate schedule
    * (combiners.py:234-264). */
  def allFanoutScheduleCosts(chunksCount: Long, bytesPerChunk: Double,
                             maxWorkers: Long,
                             costPerStage: Double = 0.1,
                             chunksPerSecond: Double = 1500,
                             bytesPerSecond: Double = 25e6): Seq[(Vector[Int], Double)] = {
    val maxStages = math.ceil(math.log(chunksCount.toDouble) / math.log(2.0)).toInt
    (1 to maxStages).map { stages =>
      val fanout = math.ceil(math.pow(chunksCount.toDouble, 1.0 / stages)).toInt
      val bins = completeFanoutBins(fanout, stages, chunksCount)
      var cost = 0.0
      var tasks = chunksCount
      bins.foreach { stageBins =>
        tasks = (tasks + stageBins - 1) / stageBins
        val chunks = fanout + 1 // one extra chunk for writing
        val runtimePerTask =
          chunks / chunksPerSecond + bytesPerChunk * chunks / bytesPerSecond
        cost += math.ceil(tasks.toDouble / maxWorkers) * runtimePerTask + costPerStage
      }
      bins -> cost
    }
  }

  /** The optimal schedule for a mean over `dims` (combiners.py:267-291).
    * Empty result = one chunk per key, no combiner needed. */
  def optimalFanoutBins(dims: Seq[String], chunks: Map[String, Int],
                        sizes: Map[String, Long], itemsize: Long): Vector[Int] = {
    val chunksCount = dims.map(d => (sizes(d) + chunks(d) - 1) / chunks(d)).product
    val bytesPerChunk = itemsize.toDouble *
      chunks.collect { case (d, c) if !dims.contains(d) => c.toLong }.product
    val origBytes = itemsize.toDouble * sizes.values.map(_.toDouble).product
    val maxWorkers = math.max(math.ceil(origBytes / 5e9).toLong, 10000L)
    val candidates = allFanoutScheduleCosts(chunksCount, bytesPerChunk, maxWorkers)
    if (candidates.isEmpty || chunksCount <= 1) Vector.empty
    else candidates.minBy(_._2)._1
  }

  /** Flat chunk index from a key's offsets, row-major over `dims`
    * (combiners.py:190-202). */
  def chunkIndex(key: ChunkKey, dims: Seq[String], chunks: Map[String, Int],
                 sizes: Map[String, Long]): Long = {
    val shape = dims.map(d => (sizes(d) + chunks(d) - 1) / chunks(d))
    var index = 0L
    dims.indices.foreach { i =>
      val ci = key.offsets(dims(i)) / chunks(dims(i))
      index += ci * shape.drop(i + 1).product
    }
    index
  }

  /** Assign a flat index to per-stage bins (combiners.py:205-216):
    * least-significant factor first. */
  def indexToFanoutBins(index: Long, binsPerStage: Vector[Int]): Vector[Long] = {
    val totalBins = binsPerStage.map(_.toLong).product
    var binId = if (totalBins == 0) 0L else index % totalBins
    binsPerStage.map { factor =>
      val b = binId % factor
      binId /= factor
      b
    }
  }
}
