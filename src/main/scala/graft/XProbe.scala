package graft
import org.apache.spark.sql.SparkSession

/** Dev probe: stage-level timing of the x112/x113 chunk-engine paths. */
object XProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.api.{TabularBridge, XbeamDataset}
    import graft.ndarray.DType
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[xprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val n: Long = graft.queries.Tables.t(spark, sfDir, "events").count()
    val W = 50L
    def grid = TabularBridge.fromDataFrame(
      graft.queries.Tables.t(spark, sfDir, "events").selectExpr(
        s"event_id div $W AS t", s"event_id % $W AS x",
        "user_id AS uid", "CAST(floor(value) AS DOUBLE) AS vf"),
      spark, dims = Seq("t" -> n / W, "x" -> W),
      vars = Seq("uid" -> DType.I64, "vf" -> DType.F64),
      chunks = Map("t" -> 16, "x" -> 16))
    val store = "/tmp/xprobe_store"
    (1 to 2).foreach { rep =>
      println(s"[xprobe] === rep $rep ===")
      time("bridge only (count pairs)") { grid.chunkDataset.count() }
      time("toZarr zstd v3") {
        graft.core.Fs.deleteRecursively(store)
        grid.toZarr(store, compressor = Some("zstd"), zarrFormat = 3)
      }
      time("fromZarr scan only") {
        TabularBridge.toDataFrame(
          XbeamDataset.fromZarr(spark, store).select(Set("vf"))).count()
      }
      time("fromZarr + approxQuantile") {
        TabularBridge.toDataFrame(
          XbeamDataset.fromZarr(spark, store).select(Set("vf"))
            .approxQuantile(0.9, Set("x"), bins = 32)).count()
      }
      time("grid approxQuantile only") {
        TabularBridge.toDataFrame(
          grid.select(Set("vf")).approxQuantile(0.9, Set("x"), bins = 32))
          .count()
      }
      time("x113 full (with orderBy)") {
        graft.SparkEntry.queries("x113_store_approx_quantile")(spark, sfDir)
          .count()
      }
      time("x112 full") {
        graft.SparkEntry.queries("x112_groupby_approx_quantile")(spark, sfDir)
          .count()
      }
    }
    spark.stop()
  }
}
