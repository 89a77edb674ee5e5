package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where do the dedup gates' seconds go at sf0.1? */
object DProbe {
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
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        if (wall > 120) {
          val acc = si.accumulables.values.flatMap { a =>
            val n = a.name.getOrElse("")
            if (n == "internal.metrics.shuffle.read.recordsRead" ||
                n == "internal.metrics.shuffle.write.recordsWritten" ||
                n == "internal.metrics.executorRunTime" ||
                n == "number of output rows")
              Some(s"${n.stripPrefix("internal.metrics.")}=${a.value.getOrElse("?")}")
            else None
          }.mkString(" ")
          println(f"[dstage] id=${si.stageId} ${wall}%5d ms tasks=${si.numTasks}%3d $acc :: ${si.name.take(50)}")
        }
      }
    })
    import graft.queries.Tables
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dprobe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val SH = graft.queries.TextOps.SHINGLES_SPARK
    def shingled = Tables.t(spark, sfDir, "documents")
      .filter(expr("size(split(text, ' ')) >= 3"))
      .selectExpr("doc_id", "lang", "n_chars", s"$SH AS shingles")
    def base = shingled.selectExpr("doc_id", "lang", "n_chars", "shingles",
      "array_sort(transform(shingles, x -> xxhash64(x))) AS hsh",
      "size(shingles) AS sz")
    def hashOnly = shingled.selectExpr("doc_id", "lang", "n_chars",
      "array_sort(transform(shingles, x -> xxhash64(x))) AS hsh",
      "size(shingles) AS sz")
    (1 to 2).foreach { rep =>
      println(s"[dprobe] === rep $rep ===")
      time("shingle pass, no persist") { base.write.format("noop").mode("overwrite").save() }
      time("persist(M_A_D) full base + count") {
        val p = base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count(); p.unpersist(true); ()
      }
      time("persist(M_A_D) hash-only + count") {
        val p = hashOnly.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count(); p.unpersist(true); ()
      }
      time("localCheckpoint(lazy) base + count") {
        val p = base.localCheckpoint(false)
        p.count(); ()
      }
      val fp0 = Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(expr("array_distinct(split(text, ' '))")).as("w"))
        .withColumn("h", expr("cast(conv(substr(md5(w), 1, 8), 16, 10) AS bigint)"))
      time("d06 fp agg, no persist (noop)") {
        val sums = (0 until 32).map(b => sum(expr(s"shiftright(h, $b) & 1")).as(s"p$b"))
        fp0.groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n"), sums: _*)
          .write.format("noop").mode("overwrite").save()
      }
      time("d04 full gate") {
        graft.SparkEntry.queries("d04_minhash_lsh_candidates")(spark, sfDir).count()
      }
      time("d06 full gate") {
        graft.SparkEntry.queries("d06_simhash_neardup_pairs")(spark, sfDir).count()
      }
      time("d06 body, no scope/orderBy") {
        spark.conf.set("spark.graft.queryScope", "lazy")
        try {
          val wd = Tables.t(spark, sfDir, "documents")
            .select(col("doc_id"), col("lang"),
              explode(expr("array_distinct(split(text, ' '))")).as("w"))
            .withColumn("h", expr("cast(conv(substr(md5(w), 1, 8), 16, 10) AS bigint)"))
          val sums = (0 until 32).map(b => sum(expr(s"shiftright(h, $b) & 1")).as(s"p$b"))
          val fpe = (0 until 32).map(b =>
            expr(s"CASE WHEN p$b * 2 > n THEN ${1L << b}L ELSE 0L END")).reduce(_ + _)
          val fp = wd.groupBy(col("doc_id"), col("lang"))
            .agg(count(lit(1)).as("n"), sums: _*)
            .select(col("doc_id"), col("lang"), fpe.as("simhash"))
          val bands = fp
            .withColumn("blk", explode(expr("sequence(0, 6)")))
            .withColumn("bval", expr(
              """shiftright(simhash,
                 |  CASE WHEN blk < 4 THEN blk * 5 ELSE 20 + (blk - 4) * 4 END)
                 |& CASE WHEN blk < 4 THEN 31 ELSE 15 END""".stripMargin))
          val out = bands.as("a").join(bands.as("b"),
              col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval") &&
                col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
            .withColumn("x", expr("a.simhash ^ b.simhash"))
            .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
              expr("cast(bit_count(x) AS bigint)").as("hamming"))
            .filter(col("hamming") <= 6)
          out.write.format("noop").mode("overwrite").save()
        } finally spark.conf.set("spark.graft.queryScope", "eager")
      }
      System.gc()
    }
    spark.stop()
  }
}
